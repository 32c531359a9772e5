package graft

import org.apache.spark.sql.SparkSession

/** Time a single registered query against a data dir — the triage
  * loop for per-query scaling work (`BENCH_full_latest_sf1.json`
  * ratios): `sbt "runMain graft.RunOne q_embed_near_dup_lsh
  * /tmp/sf1"`. Same session shape and noop-sink discipline as
  * [[Bench]] — with one DEFAULT divergence to know when reproducing a
  * board row: with SPARK_GRAFT_CPUS unset, RunOne runs local[32] (the
  * repo's floor convention, every SCALE.md floor row) while Bench
  * defaults to local[4]; set the env var to the board's value when
  * the regression under triage could be parallelism-shaped. The cpus
  * used are printed in every output row so floors self-describe.
  * Prints best-of-2 like the bench row it reproduces. */
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
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    // `name` may be a comma-separated sequence: each runs in order in
    // the SAME JVM/session (bench-board conditions) — the A/B tool for
    // "query X is only slow when it runs after query Y" effects.
    // GRAFT_RUNONE_RUNS>2 prints each query's whole run sequence —
    // separates the JIT/codegen floor from the steady-state cost when
    // a cheap query regresses on the board (the bench bills best-of-2,
    // so a floor shift and a real regression look identical there).
    // tolerant parse (the Bench PASSES discipline): a malformed or
    // non-positive value falls back to 2 instead of killing the
    // triage run after the warmup has been paid
    val n = sys.env.get("GRAFT_RUNONE_RUNS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(2)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val runs = (1 to n).map { _ =>
        val t = once(); spark.catalog.clearCache(); t
      }
      println(f"[runone] $q $sfDir cpus=$cpus best=${runs.min}%.2f s " +
        s"(runs ${runs.map(t => f"$t%.2f").mkString(" / ")})")
    }
    spark.stop()
  }
}
