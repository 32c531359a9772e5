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
  *    fps, build the sharded store (shards = ceil(n / cap)).
  *  - BATCH (the steady-state number): screen a FIXED 400k-doc batch
  *    (50% true dups) against the store twice, report best-of-2 and
  *    the max per-shard filter size. Flat batch time + bounded filter
  *    bytes across the three rows is the claim under test.
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
        when(col("id") % 2 === 0, concat(lit("h "), col("id") / 2))
          .otherwise(concat(lit("x "), col("id"))).as("text"))
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
      val t0 = System.nanoTime()
      Dedup.buildBloomStore(history, store, shards,
        itemsPerShard = (n + shards - 1) / shards)
      val epochS = (System.nanoTime() - t0) / 1e9
      val sizes = spark.read.parquet(store)
        .select(max(length(col("filter"))).as("mx"),
          sum("n_fps").as("tot")).head()
      // SCREEN-ONLY: the stage whose flatness is the claim under
      // test (plan-literal bounded per job, cost batch-sized)
      def screenOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.screenAgainstBloomStore(spark, batch, store, shards))
        (System.nanoTime() - b0) / 1e9
      }
      // FULL dedup: adds the exact confirm anti-join, whose history
      // side grows with n on a flat (unbucketed) fp table — reported
      // to show where store bucketing takes over, not part of the
      // flatness claim
      def fullOnce(): Double = {
        val b0 = System.nanoTime()
        force(Dedup.dedupAgainstBloomStore(spark, batch, history, store,
          shards))
        (System.nanoTime() - b0) / 1e9
      }
      val screenS = Seq(screenOnce(), screenOnce()).min
      val fullS = Seq(fullOnce(), fullOnce()).min
      println(f"[stress-bloom] history=${n / 1000000}%2dM shards=$shards%2d " +
        f"epoch=${epochS}%6.1f s  screen=${screenS}%5.1f s  " +
        f"full=${fullS}%5.1f s  " +
        f"max_filter=${sizes.getAs[Int]("mx") / 1048576.0}%5.1f MiB  " +
        f"stored_fps=${sizes.getAs[Long]("tot")}")
    }
    spark.stop()
  }
}
