package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the prefix-sharded bloom screen's steady-state contract:
  * PER-BATCH screen cost stays flat as the history fp store grows
  * across the single-filter ceiling ([[graft.ops.Dedup.BloomShardItemCap]]
  * = Spark's own 4M-item runtime-filter cap), because every screen job
  * embeds at most ONE shard-sized literal no matter how large the
  * epoch's history is.
  *
  * Protocol per history size n ∈ {2M, 8M, 32M} (1×, 2×, 8× the cap):
  *  - EPOCH (amortized, reported separately): synthesize n history
  *    fps, build the sharded bloom store (shards = ceil(n / cap)) AND
  *    the fp-BUCKETED ingest store the confirm join rides.
  *  - BATCH (the steady-state number): screen a FIXED 400k-doc batch
  *    (50% true dups) against the store twice, report best-of-2 and
  *    the max per-shard filter size. Flat batch time + bounded filter
  *    bytes across the three rows is the claim under test.
  *  - FULL (screen + exact confirm): `full_flat` confirms against the
  *    flat localCheckpoint fp frame (re-sorts history per batch — the
  *    growth term bucketing removes), `full_store` against the
  *    bucketed ingest store via dedupAgainstIngestStore (exchange- and
  *    sort-free history side; the column whose flatness is the r14
  *    claim).
  *
  * Then a SHARD-COUNT flatness row: the same 8M history stored at its
  * natural 2 shards vs a forced 32 — per-batch screen wall must not
  * grow with shard count (one cogroup job either way; the old
  * one-driver-job-per-shard loop grew linearly here).
  */
object StressBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, TextStats}
    val cap = Dedup.BloomShardItemCap

    // fixed batch: doc ids 0..400k, even ids duplicate a history doc
    val batch = spark.range(400000L)
      .select(col("id").as("doc_id"),
        // integer DIV: `col / 2` is DOUBLE division ("h 192.0" never
        // matches history's "h 192" — the dup rate silently read 0%)
        when(col("id") % 2 === 0, concat(lit("h "), expr("id DIV 2")))
          .otherwise(concat(lit("x "), col("id"))).as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .localCheckpoint()
    // the steady-state regime: a mostly-NEW batch (0.1% re-crawls) —
    // the screened confirm's bucket-pruned IN probe should make its
    // per-batch store IO proportional to the dup count, where the
    // unscreened loop pays the full history scan regardless
    val lowDup = spark.range(400000L)
      .select(col("id").as("doc_id"),
        when(col("id") % 1000 === 0, concat(lit("h "), expr("id DIV 1000")))
          .otherwise(concat(lit("y "), col("id"))).as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .localCheckpoint()

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (n <- Seq(2000000L, 8000000L, 32000000L)) {
      val shards = ((n + cap - 1) / cap).toInt
      val history = spark.range(n)
        .select(TextStats.fingerprint(concat(lit("h "), col("id")))
          .as("fp"))
        .localCheckpoint()
      val store = s"/tmp/graft-bloom-store/n$n"
      val fpStore = s"/tmp/graft-bloom-store/fps$n"
      // appendToStore is NOT idempotent (unlike buildBloomStore's
      // overwrite): a re-run against a surviving fps$n dir would
      // double the store and break the one-file-per-bucket sort-free
      // precondition the full_store column measures — rebuild it
      // from scratch every run
      spark.sql("DROP TABLE IF EXISTS " +
        graft.streaming.Ingest.storeTableName(spark, fpStore))
      val fpPath = new org.apache.hadoop.fs.Path(fpStore)
      fpPath.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(fpPath, true)
      val t1 = System.nanoTime()
      graft.streaming.Ingest.appendToStore(spark, fpStore, history,
        buckets = 32)
      val epochFpS = (System.nanoTime() - t1) / 1e9
      // filters AFTER fps so the store records the epoch it covers —
      // the coherence gate dedupAgainstIngestStore now enforces
      val t0 = System.nanoTime()
      Dedup.buildBloomStore(history, store, shards,
        itemsPerShard = (n + shards - 1) / shards,
        coversEpoch = graft.streaming.Ingest.storeEpoch(spark, fpStore))
      val epochS = (System.nanoTime() - t0) / 1e9
      val sizes = spark.read.parquet(store)
        .select(max(length(col("filter"))).as("mx"),
          sum("n_fps").as("tot")).head()
      // SCREEN-ONLY: the stage whose flatness is the claim under
      // test (one cogroup job, cost batch-sized)
      def screenOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.screenAgainstBloomStore(spark, batch, store, shards))
        (System.nanoTime() - b0) / 1e9
      }
      // FULL dedup, flat history: the confirm anti-join re-sorts the
      // localCheckpoint fp frame each batch — the growth term
      def fullFlatOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.dedupAgainstBloomStore(spark, batch, history, store,
          shards))
        (System.nanoTime() - b0) / 1e9
      }
      // FULL dedup, BUCKETED history store: exchange- and sort-free
      // confirm — the steady-state column, must stay flat in n
      def fullStoreOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.dedupAgainstIngestStore(spark, batch, fpStore, store,
          shards))
        (System.nanoTime() - b0) / 1e9
      }
      // INGEST-LOOP row: the per-micro-batch wall the streaming loop
      // pays at this history size — unscreened (whole batch through
      // the store anti-join, the old runIngest shape) vs screened
      // (bloom-positive slice only, the bloomShards > 0 shape)
      def ingestPlainOnce(): Double = {
        val b0 = System.nanoTime()
        force(graft.streaming.Ingest.ingestBatch(batch,
          graft.streaming.Ingest.readStore(spark, fpStore)))
        (System.nanoTime() - b0) / 1e9
      }
      def ingestScreenedOnce(): Double = {
        val b0 = System.nanoTime()
        force(graft.streaming.Ingest.ingestBatchScreened(spark, batch,
          fpStore, store))
        (System.nanoTime() - b0) / 1e9
      }
      // LOW-DUP (0.1%) micro-batch: the screened path's IN-probe
      // confirm vs the unscreened full history join
      def ingestPlainLow(): Double = {
        val b0 = System.nanoTime()
        force(graft.streaming.Ingest.ingestBatch(lowDup,
          graft.streaming.Ingest.readStore(spark, fpStore)))
        (System.nanoTime() - b0) / 1e9
      }
      def ingestScreenedLow(): Double = {
        val b0 = System.nanoTime()
        force(graft.streaming.Ingest.ingestBatchScreened(spark, lowDup,
          fpStore, store))
        (System.nanoTime() - b0) / 1e9
      }
      val screenS = Seq(screenOnce(), screenOnce()).min
      val fullFlatS = Seq(fullFlatOnce(), fullFlatOnce()).min
      val fullStoreS = Seq(fullStoreOnce(), fullStoreOnce()).min
      val ingestS = Seq(ingestPlainOnce(), ingestPlainOnce()).min
      val ingestScrS = Seq(ingestScreenedOnce(), ingestScreenedOnce()).min
      val ingLowS = Seq(ingestPlainLow(), ingestPlainLow()).min
      val ingLowScrS = Seq(ingestScreenedLow(), ingestScreenedLow()).min
      println(f"[stress-bloom] history=${n / 1000000}%2dM shards=$shards%2d " +
        f"epoch=${epochS}%6.1f s  epoch_fp=${epochFpS}%6.1f s  " +
        f"screen=${screenS}%5.1f s  full_flat=${fullFlatS}%5.1f s  " +
        f"full_store=${fullStoreS}%5.1f s  " +
        f"ingest=${ingestS}%5.1f s  ingest_screened=${ingestScrS}%5.1f s  " +
        f"ingest_lowdup=${ingLowS}%5.1f s  " +
        f"ingest_lowdup_screened=${ingLowScrS}%5.1f s  " +
        f"max_filter=${sizes.getAs[Int]("mx") / 1048576.0}%5.1f MiB  " +
        f"stored_fps=${sizes.getAs[Long]("tot")}")
      // drop the 32M-row checkpoint blocks before the next decade —
      // accumulated history frames otherwise pressure later rows'
      // readings (measured 8x on the shard-flatness rows)
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(history)
    }

    // SHARD-COUNT flatness: same 8M history, natural 2 shards vs a
    // forced 32 — one cogroup job either way, wall must not scale
    // with shard count
    for (shards <- Seq(2, 32)) {
      val n = 8000000L
      val history = spark.range(n)
        .select(TextStats.fingerprint(concat(lit("h "), col("id")))
          .as("fp"))
        .localCheckpoint()
      val store = s"/tmp/graft-bloom-store/s$shards"
      Dedup.buildBloomStore(history, store, shards,
        itemsPerShard = (n + shards - 1) / shards)
      def screenOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.screenAgainstBloomStore(spark, batch, store, shards))
        (System.nanoTime() - b0) / 1e9
      }
      val screenS = Seq(screenOnce(), screenOnce()).min
      println(f"[stress-bloom] shard-flatness history= 8M " +
        f"shards=$shards%2d screen=${screenS}%5.1f s")
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(history)
    }
    spark.stop()
  }
}
