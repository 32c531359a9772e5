package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.streaming.IngestEmbed
    // build the stale store exactly like the gate
    import graft.ops.{Quantize, Scratch}
    val m = 5
    def slice(b: Int) = graft.core.Tables.embeddings(spark, dir)
      .where(pmod(col("vec_id"), lit(m)) === b).select("vec_id", "embedding")
    def drifted(b: Int) = Quantize.driftedBatch(
        IngestEmbed.normalizedFor(slice(b)), b, 0.15)
      .select(col("vec_id"), col("vec").cast("array<float>").as("embedding"))
    val stale = Scratch.cached(spark, s"tmp-stale", "graft-tmp-stale") { p =>
      IngestEmbed.applyEmbedBatch(spark, slice(0), 0L, p, tau = 0.9)
      (1 to 4).foreach(b => IngestEmbed.applyEmbedBatch(spark, drifted(b), b.toLong, p, tau = 0.9))
    }
    val nfiles = new java.io.File(stale + "/vindex/data")
    def countFiles(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).map(_.map(countFiles).sum).getOrElse(0)
    println("data files: " + countFiles(nfiles))
    val queries = Quantize.driftedBatch(
        IngestEmbed.normalizedFor(slice(0).where(col("vec_id") < 50)), 5, 0.15)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec")).localCheckpoint()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          println(s"[stage] tasks=${sc.stageInfo.numTasks} id=${sc.stageInfo.stageId} ${sc.stageInfo.name.take(50)}")
      })
    val topk = IngestEmbed.embedIndexTopK(spark, stale, queries, 10)
    topk.write.mode("overwrite").format("noop").save()
    Thread.sleep(300)
    println(topk.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
