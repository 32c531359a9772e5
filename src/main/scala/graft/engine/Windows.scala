package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Window-function and grouping-set coverage beyond the reference's
  * single `row_number` (SURVEY §2.5 notes rank/dense_rank/lag/lead and
  * rollup/cube are absent from the reference — a complete library needs
  * them, and they are all Catalyst built-ins with identical ANSI
  * semantics in the DuckDB oracle).
  *
  * Scale notes: every window here partitions by a key whose group sizes
  * are bounded by the data model (orders per customer, days per event
  * type), so WindowExec's per-partition buffering is safe; none uses an
  * unpartitioned global window (the classic 100 TB anti-pattern — a
  * single-task sort).
  */
object Windows {

  /** rank / dense_rank / ntile over order values per customer. */
  def orderRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"))
  }

  val orderRanksSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       RANK() OVER w AS rnk,
      |       DENSE_RANK() OVER w AS drnk,
      |       NTILE(4) OVER w AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  /** lag / lead + running sum: per-customer order timeline with the
    * previous/next order price and a cumulative spend. The running
    * frame is ROWS UNBOUNDED PRECEDING → CURRENT ROW, stated explicitly
    * (sum-over-ordered-window defaults to RANGE, which double-counts
    * ties). */
  def orderTimeline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      sum(col("o_totalprice").cast("decimal(30,2)")).over(running)
        .cast("double").as("running_spend"))
  }

  val orderTimelineSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       LAG(o_totalprice, 1) OVER w AS prev_price,
      |       LEAD(o_totalprice, 1) OVER w AS next_price,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** ROLLUP: revenue at (returnflag, linestatus), (returnflag), ()
    * levels in one pass — Expand + single aggregate, no re-scan. */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  val pricingRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Event-time tumbling windows in batch: the `window()` function the
    * streaming extension uses (SURVEY §2.9), oracled via date_trunc —
    * 1-hour buckets of events with exact aggregates. */
  def hourlyEventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(30,2)")).cast("double") /
          count(col("value"))).as("avg_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("avg_value"))

  val hourlyEventWindowsSql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(value) AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ----- set operations (absent from the reference, SURVEY §2.7) -----

  /** Explicit GROUPING SETS with grouping_id — the general form behind
    * ROLLUP/CUBE: exactly the requested aggregation levels, one Expand
    * sized to the set count (here 3, vs CUBE's 4). */
  def pricingGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    // catalog hygiene: a FIXED view name would race concurrent callers
    // (one session, two dirs → one builder silently reads the other's
    // table) and leak the registration forever; spark.sql analyzes
    // eagerly, so the uniquely-named view can drop right after — the
    // returned frame holds the resolved relation, not the name
    val view = s"li_gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.lineitem(spark, dir).createOrReplaceTempView(view)
    try spark.sql(
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
         |       COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
         |FROM $view
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |                        (l_returnflag), ())""".stripMargin)
    finally spark.catalog.dropTempView(view)
  }

  val pricingGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |       COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())""".stripMargin

  /** Relative-rank window functions: percent_rank (rank-1)/(n-1) and
    * cume_dist — both exact rational values of two integers, so the
    * doubles are bit-portable. */
  def orderRelativeRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  val orderRelativeRanksSql: String =
    """SELECT o_custkey, o_orderkey,
      |       PERCENT_RANK() OVER w AS pct_rank,
      |       CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Interval RANGE frame: per-customer trailing 30-day spend — the
    * time-based sliding aggregate (vs the ROWS frames above). The
    * order key is days-since-epoch (an integer), so `rangeBetween`
    * bounds are exact day offsets on both engines; RANGE includes all
    * same-day ties, which keeps the result order-independent and
    * deterministic. Partitioned by customer — bounded groups, no
    * global window. */
  def trailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_date(col("o_orderdate").cast("date")))
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"),
      sum(col("o_totalprice").cast("decimal(30,2)")).over(w)
        .cast("double").as("trailing_30d_spend"),
      count(lit(1)).over(w).as("trailing_30d_orders"))
  }

  val trailingSpendSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER w AS DOUBLE)
      |         AS trailing_30d_spend,
      |       COUNT(*) OVER w AS trailing_30d_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin

  /** UNION ALL + EXCEPT + INTERSECT in one query: customers who placed
    * orders but produced no events (except), and the overlap
    * (intersect), labeled and unioned. */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val orderUsers = Tables.orders(spark, dir)
      .select(col("o_custkey").as("id")).distinct()
    val eventUsers = Tables.events(spark, dir)
      .select(col("user_id").as("id")).distinct()
    val onlyOrders = orderUsers.except(eventUsers)
      .withColumn("cohort", lit("orders_only"))
    val both = orderUsers.intersect(eventUsers)
      .withColumn("cohort", lit("both"))
    onlyOrders.unionAll(both)
  }

  val setOpsCustomersSql: String =
    """SELECT id, 'orders_only' AS cohort FROM (
      |  SELECT DISTINCT o_custkey AS id FROM orders
      |  EXCEPT
      |  SELECT DISTINCT user_id AS id FROM events)
      |UNION ALL
      |SELECT id, 'both' AS cohort FROM (
      |  SELECT DISTINCT o_custkey AS id FROM orders
      |  INTERSECT
      |  SELECT DISTINCT user_id AS id FROM events)""".stripMargin
}
