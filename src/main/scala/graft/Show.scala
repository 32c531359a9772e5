package graft

import org.apache.spark.sql.SparkSession

/** Print a registered query's rows — the eyeball end of the triage
  * toolkit (`RunOne` times, `PlanAudit` explains, this one SHOWS):
  * `sbt "runMain graft.Show q_hybrid_rrf_gate /root/testdata/sf0.01"`.
  * Caps at `GRAFT_SHOW_ROWS` (default 50) — it is a debugging lens,
  * not an export path. */
object Show {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Show <query>[,<query>...] [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.get("GRAFT_SHOW_ROWS").map(_.toInt).getOrElse(50)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      println(s"[show] $q @ $sfDir")
      SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
        .apply(spark, sfDir).show(n, truncate = false)
    }
    spark.stop()
  }
}
