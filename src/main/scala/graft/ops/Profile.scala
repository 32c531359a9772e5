package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

import graft.core.Tables

/** One-pass table profiler — the dataset-health report every
  * training-data pipeline runs before and after each transform:
  * per-column null counts, distinct counts, numeric min/max/mean,
  * string length stats.
  *
  * Single aggregate pass: all per-column statistics are aggregate
  * expressions in ONE `agg(...)`, so the table is scanned once and the
  * shuffle carries a single partial-aggregate row per task regardless
  * of column count. The wide single row then unpivots into one row
  * per column driver-side-free (stack expression). Exact distincts
  * make the profile oracle-checkable; at 100 TB swap
  * `count_distinct` → `approx_count_distinct` per column via the
  * `exact` flag. */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      val (mn, mx, mean) = f.dataType match {
        case _: NumericType =>
          (min(c).cast(DoubleType), max(c).cast(DoubleType),
            sum(c.cast("decimal(30,4)")).cast(DoubleType) / count(c))
        case StringType =>
          (min(length(c)).cast(DoubleType), max(length(c)).cast(DoubleType),
            sum(length(c).cast("decimal(30,4)")).cast(DoubleType) / count(c))
        case _ => (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
          lit(null).cast(DoubleType))
      }
      val base = Seq(
        count(c).as(s"${f.name}__n"),
        mn.as(s"${f.name}__min"),
        mx.as(s"${f.name}__max"),
        mean.as(s"${f.name}__mean"))
      if (exact) base
      else approx_count_distinct(c).as(s"${f.name}__distinct") +: base
    }
    // total row count rides in the same single aggregate pass — a
    // separate df.count() would scan the table twice
    val allAggs = aggs :+ count(lit(1)).as("__total")
    // Exact N-column distincts are NOT folded into the one aggregate:
    // N distinct-aggregate groups make Spark plan an Expand that
    // replays every scan row N+1 times through the partial aggregate
    // (guide §2.3 "shuffle fewer bytes" — the Expand multiplies both
    // the scan rows and the exchange). One single-distinct aggregate
    // PER COLUMN instead planes each as a two-stage partial distinct
    // (no Expand, column-pruned scan of just that column), and the
    // 1-row results crossJoin back onto the base pass — r18, plan
    // evidence in plans/r18/q_profile_orders_{before,after}.txt.
    // The HLL path keeps the true single-pass shape (no Expand there).
    val onePass = df.agg(allAggs.head, allAggs.tail: _*)
    val wide =
      if (!exact) onePass
      else cols.foldLeft(onePass) { (acc, f) =>
        acc.crossJoin(df.agg(
          count_distinct(col(f.name)).as(s"${f.name}__distinct")))
      }
    val stackExpr = cols.map { f =>
      s"'${f.name}', ${f.name}__n, ${f.name}__distinct, " +
        s"${f.name}__min, ${f.name}__max, ${f.name}__mean"
    }.mkString(", ")
    wide.select(col("__total"), expr(
      s"stack(${cols.length}, $stackExpr) AS " +
        "(column_name, n_non_null, n_distinct, min_val, max_val, mean_val)"))
      .withColumn("n_null", col("__total") - col("n_non_null"))
      .drop("__total")
  }

  /** Profile of the orders table — the oracle query. Numeric mins are
    * exact; means use the decimal-sum/IEEE-divide determinism pattern;
    * string columns profile their lengths. */
  def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  /** Scale default: HLL distincts avoid the Expand that exact
    * multi-column count_distinct forces (×#distinct-aggs scan-row
    * multiplication). Registered rows-only — estimates can't hash-match
    * an exact oracle; the exact form above stays as the oracle. */
  def ordersProfileHll(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir), exact = false)

  val ordersProfileSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS column_name, COUNT($c) AS n_non_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_val,
         |  CAST(MAX($c) AS DOUBLE) AS max_val,
         |  CAST(SUM(CAST($c AS DECIMAL(30,4))) AS DOUBLE) / COUNT($c) AS mean_val,
         |  (SELECT COUNT(*) FROM orders) - COUNT($c) AS n_null
         |FROM orders""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS column_name, COUNT($c) AS n_non_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN(LENGTH($c)) AS DOUBLE) AS min_val,
         |  CAST(MAX(LENGTH($c)) AS DOUBLE) AS max_val,
         |  CAST(SUM(CAST(LENGTH($c) AS DECIMAL(30,4))) AS DOUBLE) / COUNT($c) AS mean_val,
         |  (SELECT COUNT(*) FROM orders) - COUNT($c) AS n_null
         |FROM orders""".stripMargin
    def other(c: String) =
      s"""SELECT '$c' AS column_name, COUNT($c) AS n_non_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  NULL::DOUBLE AS min_val, NULL::DOUBLE AS max_val,
         |  NULL::DOUBLE AS mean_val,
         |  (SELECT COUNT(*) FROM orders) - COUNT($c) AS n_null
         |FROM orders""".stripMargin
    Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
      num("o_totalprice"), other("o_orderdate"), str("o_orderpriority"))
      .mkString("\n", "\nUNION ALL\n", "")
  }

  /** Token-length histogram per source in power-of-two buckets — the
    * corpus-shape profile a mixing/packing review reads (a source
    * whose mass sits in 1-8-token docs is boilerplate; one with 4k+
    * tails needs chunking). The bucket is INTEGER-exact on every
    * engine: floor(log2 n) + 1 computed as the binary-digit count
    * `length(bin(n))` — no transcendental log whose last ulp could
    * flip a boundary doc into the next bucket. One text scan, one
    * partial-agg shuffle carrying (source × buckets) rows.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        length(bin(col("n_tokens"))).as("bucket"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))

  val lengthHistogramSql: String =
    """WITH t AS (
      |  SELECT source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT source, CAST(length(bin(n_tokens)) AS INT) AS bucket,
      |       COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |       MIN(n_tokens) AS min_tokens,
      |       MAX(n_tokens) AS max_tokens
      |FROM t GROUP BY 1, 2""".stripMargin
}
