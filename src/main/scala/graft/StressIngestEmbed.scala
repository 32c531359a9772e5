package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch latency A/B for the two within-batch disciplines of
  * [[graft.streaming.IngestEmbed.applyEmbedBatch]] — the r9-verdict
  * ask: offer the centroid screen as the per-batch path for
  * duplicate-heavy streams and MEASURE it against the pair join.
  *
  * Stream shape: each micro-batch is the sf0.1 embedding corpus with
  * `copies` near-copies per vector (deterministic per-copy blend with
  * the reversed vector — cosine to the base ≳ 1−10⁻⁴·copy, the
  * duplicate regime), ids batch-disjoint, vectors batch-distinct (a
  * per-batch sign flip decorrelates batches so the history probe
  * doesn't kill everything after batch 0 — some near-dup survivors
  * carry over, as a real crawler stream would). Batch 0 therefore
  * times the pure within-batch stage; batch 1+ time the steady state
  * (history probe + within-batch) at a growing index.
  *
  * Run: `sbt "runMain graft.StressIngestEmbed [copies] [batches]"`
  * (defaults 25, 3 ⇒ 50k-row batches). Prints one line per
  * (mode, batch): wall-clock + kept count. Kept counts NEED NOT match
  * across modes (the screen keeps conservatively); the spec in
  * StreamingSpec pins the semantic properties, this harness prices
  * them.
  */
object StressIngestEmbed {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(25)
    val batches = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    val base = graft.core.Tables.embeddings(spark, dir)
    val nBase = base.count()
    def batchDf(b: Int) = base
      .crossJoin(spark.range(copies).toDF("copy"))
      .select(
        (col("vec_id") + col("copy") * nBase + b.toLong * nBase * copies)
          .as("vec_id"),
        expr(s"""transform(
             zip_with(embedding, reverse(embedding),
               (x, y) -> x + copy * 0.0001D * y),
             (x, i) -> IF((shiftright(xxhash64(${b}L), pmod(i, 63)) & 1) = 1,
                          -x, x))""").as("embedding"),
        col("label"))
      .localCheckpoint()
    println(s"[ingestembed] batch rows=${nBase * copies} " +
      s"(base=$nBase x copies=$copies), batches=$batches")

    for (mode <- Seq("pairs", "screen")) {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-ingestembed-$mode").toString + "/w"
      for (b <- 0 until batches) {
        val df = batchDf(b)
        val t0 = System.nanoTime()
        graft.streaming.IngestEmbed.applyEmbedBatch(spark, df, b.toLong,
          work, withinBatch = mode)
        val sec = (System.nanoTime() - t0) / 1e9
        val kept = graft.streaming.IngestEmbed
          .keptEmbeddings(spark, work).count()
        println(f"[ingestembed] mode=$mode%-6s batch=$b " +
          f"${sec}%7.1f s  kept_total=$kept")
      }
    }
    spark.stop()
  }
}
