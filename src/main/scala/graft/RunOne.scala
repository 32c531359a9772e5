package graft

import org.apache.spark.sql.SparkSession

/** Time a single registered query against a data dir — the triage
  * loop for per-query scaling work (`BENCH_full_latest_sf1.json`
  * ratios): `sbt "runMain graft.RunOne q_embed_near_dup_lsh
  * /tmp/sf1"`. Same session shape and noop-sink discipline as
  * [[Bench]]; prints best-of-2 like the bench row it reproduces. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RunOne <query> [sfDir] [cpus]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val a = once(); spark.catalog.clearCache()
    val b = once(); spark.catalog.clearCache()
    println(f"[runone] $name $sfDir best=${math.min(a, b)}%.2f s " +
      f"(runs $a%.2f / $b%.2f)")
    spark.stop()
  }
}
