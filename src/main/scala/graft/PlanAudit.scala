package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary","q_revenue_by_region","q_revenue_by_priority",
      "q_events_daily_agg","q_minhash_lsh_pairs","q_ann_topk",
      "q_asof_join","q_topk_best_day","q_stream_join","q_pack_shards",
      "q_trailing_spend")
    for (n <- names) {
      println(s"########## $n")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
