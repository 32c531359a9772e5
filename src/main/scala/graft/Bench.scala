package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Measurement notes:
  *  - Each query is forced through the `noop` sink — full plan
  *    execution and row materialization, no driver collect and no
  *    count-only shortcuts.
  *  - One session-warmup pass (tiny action + one cheap query) runs
  *    first so JVM/codegen startup isn't billed to the first query.
  *  - Streaming throughput (events rows/s through the §2.4 aggregate
  *    with Trigger.AvailableNow) is reported alongside wall-clocks.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // session warmup: JIT, codegen, parquet reader init
    spark.range(1000000).selectExpr("sum(id)").collect()
    force(SparkEntry.queries("q_distinct_types")(spark, sfDir))

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // streaming throughput: rows/s through the streaming aggregate
    val nEvents = graft.core.Tables.events(spark, sfDir).count()
    val t0 = System.nanoTime()
    val streamed = graft.streaming.StreamAggregator.streamAggQuery(spark, sfDir)
    streamed.write.mode("overwrite").format("noop").save()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val rowsPerSec = nEvents / streamSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stream_rows_per_sec":$rowsPerSec,"stream_sec":$streamSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
