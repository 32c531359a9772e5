package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the reference's full loop: producer
  * day-by-day replay → file stream → stateful aggregate → memory sink →
  * SQL over the live table. Usage:
  *   sbt "runMain graft.streaming.ReplayDemo [sfDir]"
  */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val watched = Files.createTempDirectory("graft-replay-demo").toString
    println(s"[demo] replaying $sfDir events day-by-day into $watched")
    val rows = IncrementalProducer.replay(spark, sfDir, watched)
    println(s"[demo] produced $rows rows")

    val agg = StreamAggregator.dailyAgg(
      StreamAggregator.replayStream(spark, s"$watched/day=*",
        maxFilesPerTrigger = Some(2)))
    val result = StreamAggregator.runToMemoryTable(spark, agg, "result_df_query")
    println(s"[demo] aggregate has ${result.count()} (event_type, day) groups")

    // the reference's cell-3 SQL shape over the live memory table
    spark.sql(
      """SELECT event_type, day, distinct_users FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY event_type
        |    ORDER BY distinct_users DESC, day DESC) AS row_num
        |  FROM result_df_query)
        |WHERE row_num = 1
        |ORDER BY distinct_users DESC LIMIT 10""".stripMargin)
      .show(truncate = false)
    spark.stop()
  }
}
