package graft.streaming

import org.apache.hadoop.fs.Path
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

  /** Bucket count for the fp store. Sized for the test corpus; at
    * production scale derive it from the expected fingerprint volume
    * (~128 MB per bucket) ONCE at store creation — the bucket count
    * is part of the table layout and every append must match it. */
  val StoreBuckets = 8

  /** One catalog table per store directory (the catalog needs a name;
    * the hash keeps concurrent test stores apart). The table is
    * external: the data lives at `storeDir`, the catalog holds the
    * bucketing metadata that makes the store side of the anti-join
    * shuffle-free. */
  def storeTableName(storeDir: String): String =
    f"graft_fp_store_${storeDir.hashCode & 0x7fffffff}%x"

  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Register (on first use) the bucketed external store table. A
    * pre-existing NON-bucketed store layout at `storeDir` (e.g. from
    * an older deployment) must be migrated through [[compactStore]]'s
    * rewrite before bucketed reads are valid; fresh stores start
    * bucketed. */
  private def ensureStore(spark: SparkSession, storeDir: String): String = {
    val tbl = storeTableName(storeDir)
    if (!spark.catalog.tableExists(tbl)) {
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
        .write.option("path", storeDir)
        .format("parquet")
        .bucketBy(StoreBuckets, "fp").sortBy("fp")
        .saveAsTable(tbl)
    }
    tbl
  }

  /** Append fingerprints bucket-aligned: repartitioning by the bucket
    * column first means every task holds exactly one bucket's rows, so
    * each append adds ≤ StoreBuckets files (not tasks × buckets). */
  def appendToStore(spark: SparkSession, storeDir: String,
      fps: DataFrame): Unit = {
    val tbl = ensureStore(spark, storeDir)
    fps.select("fp")
      .repartition(StoreBuckets, col("fp"))
      .write.mode("append")
      .format("parquet")
      .bucketBy(StoreBuckets, "fp").sortBy("fp")
      .saveAsTable(tbl)
  }

  /** Rewrite the store's accumulated per-batch files to one file per
    * bucket, keeping the bucketing metadata (a plain coalesce rewrite
    * would drop it and re-impose a shuffle on every future ingest
    * join). The snapshot is localCheckpointed first so the overwrite
    * never reads the files it is deleting. */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    val tbl = ensureStore(spark, storeDir)
    val snapshot = spark.table(tbl).localCheckpoint()
    // Explicit drop + dir delete + recreate: Overwrite-mode saveAsTable
    // on an EXTERNAL table drops only the catalog entry and leaves
    // whatever files the per-job delete misses — the one place the
    // catalog and the filesystem must be forced back in sync by hand.
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val p = new Path(storeDir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    appendToStore(spark, storeDir, snapshot)
    snapshot.unpersist()
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

  /** The store as a DataFrame: the bucketed catalog table once it
    * exists; a plain parquet read for a pre-bucketing layout (correct,
    * just not shuffle-free — existence probed through the Hadoop
    * FileSystem API so HDFS/S3 store URIs behave like local paths);
    * empty otherwise. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    if (spark.catalog.tableExists(storeTableName(storeDir)))
      spark.table(storeTableName(storeDir))
    else if (pathExists(spark, storeDir))
      spark.read.schema(storeSchema).parquet(storeDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)

  /** Drive the ingest over every file currently in `srcDir` (resumes
    * from `checkpointDir`; one micro-batch per file so cross-batch
    * dedup is exercised). Appends survivors to `corpusDir` and their
    * fingerprints to the bucketed store at `storeDir`. */
  def runIngest(spark: SparkSession, srcDir: String, schema: StructType,
      corpusDir: String, storeDir: String, checkpointDir: String): Unit = {
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
        appendToStore(s, storeDir, survivors.select("fp"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
