package graft

import org.apache.spark.sql.SparkSession

/** Measures [[graft.ops.Layout.zorderScanMeasure]] at a given SF dir:
  * the same 2-D box predicate pushed through the REAL parquet reader
  * over a z-ordered vs a single-column-sorted layout of the events
  * table. The scan's numOutputRows (rows the reader delivered after
  * row-group stats pruning) is the number the [[graft.ops.Layout
  * .zorderPruneEffect]] simulation CLAIMS — this main is the proof
  * run whose numbers go to SCALE.md.
  *
  * Usage: runMain graft.ZorderScanProbe <sfDir> [numFiles]
  */
object ZorderScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files
      .createTempDirectory("graft-zscan").toString
    val rows = graft.ops.Layout.zorderScanMeasure(spark, dir, base,
      numFiles)
    val total = graft.core.Tables.events(spark, dir).count()
    rows.foreach { case (name, read, matched) =>
      println(f"[zscan] dir=$dir files=$numFiles layout=$name%-6s " +
        f"rows_read=$read%9d rows_match=$matched%9d " +
        f"read_frac=${read.toDouble / total}%.4f")
    }
    val z = rows.find(_._1 == "zorder").get._2
    val x = rows.find(_._1 == "xsort").get._2
    println(f"[zscan] z-vs-xsort read ratio = ${z.toDouble / x}%.3f " +
      s"(total_rows=$total)")
    spark.stop()
  }
}
