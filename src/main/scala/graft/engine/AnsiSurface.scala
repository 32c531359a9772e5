package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Long-tail ANSI relational surface: the operator families a user of
  * a complete analytics engine reaches for daily, each with a
  * hash-exact DuckDB oracle. All are Catalyst built-ins; the value
  * here is breadth of *verified* coverage, not novelty.
  */
object AnsiSurface {

  /** Anti-join (NOT EXISTS): customers who never produced an event.
    * `left_anti` is the guide's prescribed NOT EXISTS form — one
    * shuffle, no driver round-trip. */
  def customersWithoutEvents(spark: SparkSession, dir: String): DataFrame = {
    val eventUsers = Tables.events(spark, dir)
      .select(col("user_id").as("c_custkey")).distinct()
    Tables.customer(spark, dir)
      .join(eventUsers, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  val customersWithoutEventsSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM events WHERE user_id = c_custkey)""".stripMargin

  /** HAVING: market segments whose total balance clears a floor. */
  def richSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(
        sum(col("c_acctbal").cast("decimal(30,2)")).cast("double")
          .as("total_bal"),
        count(lit(1)).as("n_customers"))
      .where(col("total_bal") > 10000.0)

  val richSegmentsSql: String =
    """SELECT c_mktsegment,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal,
      |       COUNT(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment
      |HAVING CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) > 10000.0""".stripMargin

  /** CASE WHEN bucketing: order-value histogram — the ubiquitous
    * binning pattern. Bin edges are integers so assignment is exact. */
  def orderValueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "lt_50k")
          .when(col("o_totalprice") < 150000, "50k_150k")
          .when(col("o_totalprice") < 300000, "150k_300k")
          .otherwise("ge_300k"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))

  val orderValueHistogramSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'lt_50k'
      |            WHEN o_totalprice < 150000 THEN '50k_150k'
      |            WHEN o_totalprice < 300000 THEN '150k_300k'
      |            ELSE 'ge_300k' END AS bucket,
      |       COUNT(*) AS n_orders,
      |       MIN(o_totalprice) AS min_price,
      |       MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1""".stripMargin

  /** Correlated scalar subquery → customers above their own nation's
    * average balance. Catalyst decorrelates this into a join against
    * the per-nation aggregate; expressed here in the already-
    * decorrelated DataFrame form, with the oracle keeping the
    * correlated SQL shape (DuckDB decorrelates identically). */
  def aboveNationAverage(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val natAvg = c.groupBy("c_nationkey")
      .agg((sum(col("c_acctbal").cast("decimal(30,2)")).cast("double") /
        count(col("c_acctbal"))).as("nation_avg"))
    c.join(natAvg, Seq("c_nationkey"))
      .where(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_nationkey", "c_acctbal")
  }

  val aboveNationAverageSql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c1
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(c_acctbal)
      |  FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)""".stripMargin

  /** String-function battery over part names: upper/lower, substring,
    * concat, replace, trim-family, length, position. */
  def partNameStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      substring(col("p_name"), 1, 5).as("name_prefix"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      length(col("p_name")).as("name_len"),
      instr(col("p_name"), "a").as("first_a"))

  val partNameStringsSql: String =
    """SELECT p_partkey,
      |       UPPER(p_name) AS name_upper,
      |       SUBSTRING(p_name, 1, 5) AS name_prefix,
      |       CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |       REPLACE(p_name, ' ', '_') AS name_snake,
      |       LENGTH(p_name) AS name_len,
      |       CAST(POSITION('a' IN p_name) AS INT) AS first_a
      |FROM part""".stripMargin

  /** Pivot: order counts per priority, statuses as columns. Spark's
    * `pivot()` plans conditional aggregation; the oracle states the
    * same conditional-aggregation form explicitly (portable ANSI). */
  def ordersPivotByStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnRenamed("F", "n_f")
      .withColumnRenamed("O", "n_o")
      .withColumnRenamed("P", "n_p")

  val ordersPivotByStatusSql: String =
    """SELECT o_orderpriority,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Array aggregation: each customer's orders as a sorted key array —
    * collection types as first-class values. */
  def customerOrderArrays(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"))

  val customerOrderArraysSql: String =
    """SELECT o_custkey,
      |       array_agg(o_orderkey ORDER BY o_orderkey) AS order_keys,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** Hash-oracle form of [[customerOrderArrays]]: the sorted key array
    * rendered as a CSV string. The driver's oracle compare hashes values
    * through pandas, which cannot hash list cells — so the oracled query
    * emits a scalar rendering while the raw-array form above stays
    * available (and rows-checked) for typed consumers. Numeric sort
    * happens BEFORE the string cast (lexicographic order would differ). */
  def customerOrderArraysCsv(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(
          transform(sort_array(collect_list(col("o_orderkey"))),
            k => k.cast("string")), ",").as("order_keys_csv"),
        count(lit(1)).as("n_orders"))

  val customerOrderArraysCsvSql: String =
    """SELECT o_custkey,
      |       array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',')
      |         AS order_keys_csv,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** Map-typed values as first-class columns: per-priority status→count
    * maps built with map_from_entries, queried with map_keys /
    * element_at, and rendered canonically (sorted k:v CSV) for the
    * hash compare — the oracle states the same facts relationally
    * (maps don't hash through the driver's pandas compare, same as
    * raw arrays). */
  def statusCountMaps(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val m = map_from_entries(sort_array(
      collect_list(struct(col("o_orderstatus"), col("n")))))
    counts.groupBy("o_orderpriority")
      .agg(m.as("m"))
      .select(col("o_orderpriority"),
        size(map_keys(col("m"))).as("n_statuses"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"),
        array_join(transform(map_keys(col("m")),
          k => concat(k, lit(":"), element_at(col("m"), k))), ",")
          .as("status_counts_csv"))
  }

  val statusCountMapsSql: String =
    """SELECT o_orderpriority,
      |       COUNT(DISTINCT o_orderstatus) AS n_statuses,
      |       CAST(COALESCE(SUM(n) FILTER (WHERE o_orderstatus = 'F'), 0)
      |            AS BIGINT) AS n_f,
      |       string_agg(sc, ',' ORDER BY sc) AS status_counts_csv
      |FROM (
      |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      |         o_orderstatus || ':' || COUNT(*) AS sc
      |  FROM orders GROUP BY o_orderpriority, o_orderstatus)
      |GROUP BY o_orderpriority""".stripMargin

  /** CUBE: all grouping-set combinations of (returnflag, linestatus).
    * The decimal-cast sum is the file's exact-sum discipline — a raw
    * double sum is partition-order-dependent in the last ulp, so the
    * hash oracle would flap on non-integral quantities. */
  def pricingCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(30,2)")).cast("double")
          .as("sum_qty"))

  val pricingCubeSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
      |         AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Date-part extraction + grouping: orders per (year, quarter,
    * day-of-week). */
  def ordersByDateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"))
      .agg(count(lit(1)).as("n_orders"))

  val ordersByDatePartsSql: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      |       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
      |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |       COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2, 3""".stripMargin
}
