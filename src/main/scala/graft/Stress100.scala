package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale check (sf10-equivalent: 60M lineitem, 15M orders, 10M
  * events) for the core relational/window/streaming-shaped operators —
  * two orders of magnitude above the bench SF, big enough that a
  * wrong plan shape (payload shuffle, single-task stage, unpartial'd
  * agg) stops hiding in constant overhead. The quadratic-by-design
  * oracle paths are excluded on purpose; their scale variants are
  * covered by the 10× harness (graft.Stress).
  *
  * Replication is a crossJoin with a range — ONE scan fanning out to
  * 100 copies (a 100-way union would re-plan the scan 100 times). */
object Stress100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/stress100x"
    def xN(df: DataFrame, idCol: String, n: Int): DataFrame =
      df.crossJoin(spark.range(n).toDF("rep"))
        .withColumn(idCol, col(idCol) + col("rep") * 1000000000L)
        .drop("rep")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    def t(l: String)(f: => Unit): Unit = { val t0 = System.nanoTime()
      try { f; println(f"[stress100] $l ${(System.nanoTime() - t0) / 1e9}%.1f s") }
      catch { case e: Throwable =>
        println(s"[stress100] $l FAILED: ${e.getMessage.take(200)}") } }

    t("build 60M lineitem")(xN(graft.core.Tables.lineitem(spark, dir), "l_orderkey", 100)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet"))
    t("build 15M orders  ")(xN(graft.core.Tables.orders(spark, dir), "o_orderkey", 100)
      .write.mode("overwrite").parquet(s"$out/orders.parquet"))
    t("build 10M events  ")(xN(graft.core.Tables.events(spark, dir), "event_id", 100)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet"))
    for (tb <- Seq("customer", "nation", "region", "supplier", "part"))
      graft.core.Tables.load(spark, dir, tb)
        .write.mode("overwrite").parquet(s"$out/$tb.parquet")

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    t("q1 60M rows       ")(force(graft.engine.Relational.q1PricingSummary(spark, out)))
    t("join 60Mx15M      ")(force(graft.engine.Relational.revenueByPriority(spark, out)))
    t("star join 15M     ")(force(graft.engine.Relational.revenueByRegion(spark, out)))
    t("argmax 15M        ")(force(graft.engine.Relational.latestBestOrderPerCustomer(spark, out)))
    t("daily agg 10M     ")(force(graft.engine.Relational.eventsDailyAgg(spark, out)))
    t("topk best day 10M ")(force(graft.engine.Relational.topKByBestDay(spark, out)))
    t("pctile approx 10M ")(force(graft.engine.Relational.valuePercentilesApprox(spark, out)))
    t("funnel 10M        ")(force(graft.engine.Relational.signupFunnel(spark, out)))
    t("trailing 15M      ")(force(graft.engine.Windows.trailingSpend(spark, out)))
    t("sessions 10M      ")(force(graft.streaming.Sessionize.sessionsQuery(spark, out)))
    t("asof 10Mx15M      ")(force(graft.plans.AsOfJoin.eventsWithLatestOrder(spark, out)))

    // document ops at 20× (100k docs, 4× duplication preserved by id
    // offsetting): the full LSH → connected-components dedup flow
    t("build 100k docs   ")(xN(graft.core.Tables.documents(spark, dir), "doc_id", 20)
      .write.mode("overwrite").parquet(s"$out/documents.parquet"))
    t("lsh clusters 100k ")(force(graft.ops.Components.lshDedupClusters(spark, out)))
    t("chunk 100k docs   ")(force(graft.ops.Chunk.chunkDocs(spark, out)))
    t("repetition 100k   ")(force(graft.ops.Repetition.repetitionSignals(spark, out)))
    t("shuffle 100k docs ")(force(graft.ops.Pack.corpusShuffle(spark, out)))

    // embeddings at 20× (40k vectors): SemDeDup under the auto-scaled
    // cell count (occupancy held flat — the knob that keeps the
    // within-cell pair join linear overall; a FIXED cell count was
    // measured degrading toward all-pairs here)
    t("build 40k embeds  ")(xN(graft.core.Tables.embeddings(spark, dir), "vec_id", 20)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet"))
    t("semantic dedup 40k")(force(
      graft.ops.Similarity.semanticDedupClusters(spark, out)))

    // streaming throughput at 10M events: paced file stream through the
    // reference-shaped stateful aggregate into a memory sink
    t("stream agg 10M    ") {
      val chunkDir = java.nio.file.Files
        .createTempDirectory("graft-stress100-stream").toString
      graft.core.Tables.events(spark, out).repartition(16)
        .write.mode("overwrite").parquet(chunkDir)
      val s0 = System.nanoTime()
      val agg = graft.streaming.StreamAggregator.dailyAggExact(
        graft.streaming.StreamAggregator.replayStream(spark, chunkDir,
          maxFilesPerTrigger = Some(4)))
      val q = agg.writeStream
        .outputMode("complete").format("memory").queryName("stress100_stream")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-stress100-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - s0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      println(f"[stress100] stream: ${10000000 / sec / 1000}%.0fk rows/s over $batches batches")
    }
    spark.stop()
  }
}
