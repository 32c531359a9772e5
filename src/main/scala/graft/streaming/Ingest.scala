package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.TextStats

/** Continuous corpus ingest — the steady-state shape of a 100 TB
  * training-data pipeline: a file stream of raw document batches,
  * each micro-batch exact-deduped against the PERSISTED fingerprint
  * store before its survivors append to the corpus. `foreachBatch`
  * composes the batch operators (fingerprint, anti-join, min-id
  * collapse) per micro-batch, and the checkpoint makes re-runs
  * process only new files.
  *
  * Shuffle discipline per batch: the history side is a (fp)-only
  * table — 16 bytes/row, never text — AND it is a catalog-registered
  * table BUCKETED BY fp: the scan's output partitioning already
  * satisfies the anti-join's required distribution, so the store side
  * joins with NO Exchange no matter how large the accumulated history
  * grows (asserted in IngestSpec). Only the incoming batch — the
  * small side, by definition — shuffles, into exactly the bucket
  * layout. Batch text is scanned once.
  *
  * Store layout durability: the bucket count is TABLE LAYOUT — every
  * append must match it — so it is chosen once at store creation
  * (size it at ~128 MB of fingerprints per bucket for the expected
  * history volume) and persisted in a `_graft_buckets` sidecar file
  * inside the store directory. Reopening on a fresh JVM (the
  * in-memory catalog is session-scoped) re-registers the table from
  * the sidecar with a data-free `CREATE TABLE ... LOCATION` DDL —
  * never CTAS, which Spark refuses over a non-empty location — and a
  * caller passing a DIFFERENT bucket count than the persisted one
  * fails loudly rather than corrupting the layout (IngestSpec).
  *
  * Store maintenance: appends arrive bucket-aligned (the batch is
  * repartitioned by the bucket hash first, so each task writes one
  * file per bucket, not tasks×buckets), and [[compactStore]] rewrites
  * the accumulated per-batch files back to one file per bucket
  * without losing the bucketing metadata — `ops.Compaction`'s plain
  * coalesce would. Run it on the usual small-file cadence.
  *
  * Write-order semantics (documented, not hidden): corpus first, then
  * store. A crash between the two can re-append one batch's
  * survivors on retry — at-least-once at the batch boundary, healed
  * by any downstream exact dedup; flipping the order would instead
  * LOSE that batch. A transactional table format (Delta) is the
  * production fix; parquet-only, this is the honest trade. Re-running
  * the whole pipeline over already-ingested files is a no-op by the
  * checkpoint, and re-delivering old CONTENT is a no-op by the
  * fp store (both tested in IngestSpec). */
object Ingest {

  val storeSchema: StructType =
    StructType(Seq(StructField("fp", StringType, nullable = false)))

  /** Default bucket count for NEW fp stores, sized for the test
    * corpus; production stores pass an explicit count at creation
    * (~128 MB per bucket). Existing stores always reopen at their
    * persisted count regardless of this value. */
  val DefaultStoreBuckets = 8

  /** Sidecar file (inside the store dir) holding the bucket count the
    * store was created with. Underscore prefix ⇒ parquet readers skip
    * it as metadata, same convention as `_SUCCESS`. */
  private val BucketsSidecar = "_graft_buckets"

  /** One catalog table per store directory (the catalog needs a name).
    * The name is an md5 of the NORMALIZED absolute URI: a 31-bit
    * String.hashCode could collide two distinct directories (silently
    * binding a store to a table whose path points elsewhere), and the
    * same physical dir spelled two ways would get two tables. The
    * table is external: the data lives at `storeDir`, the catalog
    * holds the bucketing metadata that makes the store side of the
    * anti-join shuffle-free. */
  def storeTableName(spark: SparkSession, storeDir: String): String = {
    val norm = qualified(spark, storeDir).toUri.toString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"graft_fp_store_$md5"
  }

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Scheme-qualified absolute form of `dir` — the canonical identity
    * of the store (relative paths and scheme-less spellings collapse
    * to the same table name). */
  private def qualified(spark: SparkSession, dir: String): Path =
    fileSystem(spark, dir).makeQualified(new Path(dir))

  private def pathExists(spark: SparkSession, dir: String): Boolean =
    fileSystem(spark, dir).exists(new Path(dir))

  /** The persisted bucket count, if this directory holds a bucketed
    * store created by [[ensureStore]]. */
  def persistedBuckets(spark: SparkSession, storeDir: String): Option[Int] = {
    val p = new Path(storeDir, BucketsSidecar)
    val fs = fileSystem(spark, storeDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, n, StandardCharsets.UTF_8).trim.toInt)
      } finally in.close()
    }
  }

  private def writeBucketsSidecar(spark: SparkSession, storeDir: String,
      buckets: Int): Unit = {
    val fs = fileSystem(spark, storeDir)
    val out = fs.create(new Path(storeDir, BucketsSidecar), true)
    try out.write(buckets.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Register the bucketed external store table (idempotent) and
    * return (table name, effective bucket count).
    *
    * `buckets` ≤ 0 means "whatever the store already uses" (reopen);
    * a positive value is honored only at creation and VALIDATED
    * against the sidecar on reopen — appending at a different bucket
    * count than the table layout would silently break the shuffle-free
    * join, so a mismatch throws instead.
    *
    * Registration is pure DDL (`CREATE TABLE ... LOCATION`) — no data
    * write — so reopening an existing non-empty store on a fresh JVM
    * works; CTAS (`saveAsTable` on a new name) would throw on the
    * non-empty location. A non-empty directory WITHOUT a sidecar is a
    * pre-bucketing legacy layout: its files lack bucket ids, so
    * registering it bucketed would mis-prune — migrate it through
    * [[compactStore]] first (which reads it plain and rewrites it
    * bucketed). */
  def ensureStore(spark: SparkSession, storeDir: String,
      buckets: Int = 0): (String, Int) = {
    val tbl = storeTableName(spark, storeDir)
    val persisted = persistedBuckets(spark, storeDir)
    persisted.foreach { n =>
      require(buckets <= 0 || buckets == n,
        s"fp store at $storeDir was created with $n buckets; " +
          s"caller asked for $buckets — the bucket count is table " +
          "layout and cannot change on append (rewrite via compactStore)")
    }
    val n = persisted.getOrElse(if (buckets > 0) buckets
      else DefaultStoreBuckets)
    if (!spark.catalog.tableExists(tbl)) {
      val legacy = persisted.isEmpty && pathExists(spark, storeDir) &&
        fileSystem(spark, storeDir).listStatus(new Path(storeDir))
          .exists(_.getPath.getName.endsWith(".parquet"))
      require(!legacy,
        s"$storeDir holds a pre-bucketing store layout (data files, no " +
          s"$BucketsSidecar sidecar); run compactStore to migrate it " +
          "before bucketed appends")
      spark.sql(
        s"""CREATE TABLE $tbl (fp STRING) USING parquet
           |CLUSTERED BY (fp) SORTED BY (fp) INTO $n BUCKETS
           |LOCATION '${qualified(spark, storeDir).toUri}'""".stripMargin)
      if (persisted.isEmpty) writeBucketsSidecar(spark, storeDir, n)
    }
    (tbl, n)
  }

  /** Append fingerprints bucket-aligned: repartitioning by the bucket
    * column first means every task holds exactly one bucket's rows, so
    * each append adds ≤ buckets files (not tasks × buckets). `buckets`
    * only matters on first use (store creation); see [[ensureStore]].
    *
    * autoBucketedScan is OFF for the write: when `fps` itself comes
    * from an equal-bucketed table scan, the planner first elides the
    * repartition exchange (the scan's partitioning satisfies it) and
    * THEN disables the bucketed scan as "unnecessary" — the writer
    * would get raw file splits and emit tasks×buckets files. Pinning
    * the scan bucketed makes the elision actually hold. */
  def appendToStore(spark: SparkSession, storeDir: String,
      fps: DataFrame, buckets: Int = 0): Unit = {
    val (tbl, n) = ensureStore(spark, storeDir, buckets)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      fps.select("fp")
        .repartition(n, col("fp"))
        .write.mode("append")
        .format("parquet")
        .bucketBy(n, "fp").sortBy("fp")
        .saveAsTable(tbl)
    } finally spark.conf.set(key, prev)
  }

  /** Rewrite the store's accumulated per-batch files to one file per
    * bucket, keeping the bucketing metadata (a plain coalesce rewrite
    * would drop it and re-impose a shuffle on every future ingest
    * join). Also the migration path for pre-bucketing legacy layouts
    * (read plain, rewritten bucketed at `buckets` /
    * [[DefaultStoreBuckets]]).
    *
    * Crash safety: the compacted copy is fully written and durable in
    * a sibling `<storeDir>.compact.tmp` directory BEFORE anything is
    * deleted, then swapped in by two directory renames — the history
    * is never held only in executor memory. The windows that remain:
    * between the two renames the store path is briefly absent
    * (compaction is a maintenance op, not concurrent with ingest), and
    * a crash mid-swap leaves `<storeDir>.old` / `.compact.tmp` for
    * manual recovery rather than losing data. */
  def compactStore(spark: SparkSession, storeDir: String,
      buckets: Int = 0): Unit = {
    val tbl = storeTableName(spark, storeDir)
    val persisted = persistedBuckets(spark, storeDir)
    val n = persisted.getOrElse(if (buckets > 0) buckets
      else DefaultStoreBuckets)
    // Read the CURRENT layout as plain parquet files, whatever it is —
    // covers legacy non-bucketed stores without registering them
    // bucketed, and gives the rewrite an unknown input partitioning so
    // the bucket-aligning repartition in appendToStore is never elided.
    val snapshot = spark.read.schema(storeSchema).parquet(storeDir)

    // 1. Write the compacted buckets to a sibling temp dir, durable
    //    before any delete. The temp table exists only to carry the
    //    bucket spec through the write.
    val fs = fileSystem(spark, storeDir)
    val storePath = qualified(spark, storeDir)
    val tmpPath = new Path(storePath.getParent, storePath.getName + ".compact.tmp")
    val oldPath = new Path(storePath.getParent, storePath.getName + ".old")
    fs.delete(tmpPath, true)
    val tmpTbl = storeTableName(spark, tmpPath.toString)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
    appendToStore(spark, tmpPath.toString, snapshot, n)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")

    // 2. Swap: old store aside, compacted copy in, old store dropped.
    //    The catalog entry (location unchanged) survives the swap; the
    //    bucket-id file naming travels with the files.
    spark.sql(s"DROP TABLE IF EXISTS $tbl") // re-registered below at count n
    fs.delete(oldPath, true)
    if (fs.exists(storePath)) {
      require(fs.rename(storePath, oldPath),
        s"compactStore: failed to move $storePath aside")
    }
    require(fs.rename(tmpPath, storePath),
      s"compactStore: failed to move compacted store into place " +
        s"(previous store preserved at $oldPath)")
    fs.delete(oldPath, true)
    ensureStore(spark, storeDir, n)
    ()
  }

  /** One micro-batch: survivors (new content, min doc_id per fp) and
    * their fingerprints. Exposed for testing the batch semantics
    * without the stream. */
  def ingestBatch(batch: DataFrame, history: DataFrame): DataFrame = {
    val fresh = batch
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .join(history.select("fp"), Seq("fp"), "left_anti")
    val keep = fresh.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    fresh.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
  }

  /** The store as a DataFrame: the bucketed catalog table (registered
    * from the sidecar on a fresh JVM if needed); a plain parquet read
    * for a pre-bucketing layout (correct, just not shuffle-free);
    * empty otherwise. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame = {
    val registered = spark.catalog.tableExists(storeTableName(spark, storeDir))
    if (registered || persistedBuckets(spark, storeDir).isDefined)
      spark.table(ensureStore(spark, storeDir)._1)
    else if (pathExists(spark, storeDir))
      spark.read.schema(storeSchema).parquet(storeDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
  }

  /** Drive the ingest over every file currently in `srcDir` (resumes
    * from `checkpointDir`; one micro-batch per file so cross-batch
    * dedup is exercised). Appends survivors to `corpusDir` and their
    * fingerprints to the bucketed store at `storeDir` (created at
    * `storeBuckets` on first run; must match thereafter). */
  def runIngest(spark: SparkSession, srcDir: String, schema: StructType,
      corpusDir: String, storeDir: String, checkpointDir: String,
      storeBuckets: Int = 0): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val survivors = ingestBatch(batch, readStore(s, storeDir))
          .localCheckpoint() // both writes below consume it once
        survivors.drop("fp")
          .write.mode("append").parquet(corpusDir)
        appendToStore(s, storeDir, survivors.select("fp"), storeBuckets)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
