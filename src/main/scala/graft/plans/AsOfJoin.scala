package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of (nearest-predecessor) join: for each left row, the single
  * right row with the greatest right-time ≤ left-time within the same
  * key — the canonical time-alignment operator (trades⋈quotes,
  * events⋈orders) that plain equi-joins can't express.
  *
  * Implementation choice (guide preference order): composed from
  * built-ins — union + keyed window with `last_value(ignoreNulls)` —
  * rather than a custom `LogicalPlan`/`SparkPlan`. The composition is
  * one shuffle on the key + one per-key sort, which is exactly what a
  * hand-written AsOfJoinExec would do (sort-merge over co-partitioned
  * inputs); Catalyst additionally gets to push filters below it. A
  * range-join build would be O(pairs-in-range); this stays O(n log n).
  *
  * Scale: state per window is one carried value (the last-seen right
  * row), group sizes are per-key row counts — no buffering of the
  * right side, no broadcast requirement. Skewed keys fall back to the
  * same remedies as any keyed shuffle (AQE / Skew.saltedJoin is not
  * applicable since the window needs full key locality — instead
  * bound key cardinality upstream or sub-key by time range).
  */
object AsOfJoin {

  /** left(leftKey, leftTime, …) asof-join right(rightKey, rightTime,
    * rightPayloadCols) — adds the payload of the latest right row with
    * rightTime ≤ leftTime (null when none). Ties between right rows at
    * the same time resolve to the last in `tieBreak` order. */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tieBreak: String): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(Long.MaxValue))
    val lPadded = payload.foldLeft(l)((df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak).cast("long"))
    val rPadded = left.columns.foldLeft(
      payload.foldLeft(r)((df, c) => df.withColumn(s"__p_$c", col(c))))(
      (df, c) => if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = left.columns.map(col) ++
      Seq(col("__k"), col("__t"), col("__side"), col("__tie")) ++
      payload.map(c => col(s"__p_$c"))
    val unioned = lPadded.select(cols: _*)
      .unionByName(rPadded.select(cols: _*))

    // right rows sort before left rows at equal time (asof is ≤);
    // among right rows at the same instant the tieBreak max wins
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w)))
    joined
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }

  /** Each event joined to the user's most recent order placed at or
    * before the event time. */
  def eventsWithLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    asOf(events, orders,
      leftKey = "user_id", rightKey = "user_id",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey", "o_totalprice"),
      tieBreak = "o_orderkey")
      .select("event_id", "user_id", "event_type", "o_orderkey",
        "o_totalprice")
  }

  /** Oracle: identical union+window construction in SQL (DuckDB's
    * native ASOF JOIN leaves same-instant ties unspecified, so the
    * oracle states the tie-break explicitly the same way). */
  val eventsWithLatestOrderSql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t, event_type,
      |         1 AS side, 9223372036854775807 AS tie,
      |         NULL::BIGINT AS p_orderkey, NULL::DOUBLE AS p_totalprice
      |  FROM events),
      |r AS (
      |  SELECT NULL::BIGINT AS event_id, o_custkey AS user_id,
      |         o_orderdate AS t, NULL::VARCHAR AS event_type,
      |         0 AS side, o_orderkey AS tie,
      |         o_orderkey AS p_orderkey, o_totalprice AS p_totalprice
      |  FROM orders),
      |u AS (SELECT * FROM l UNION ALL BY NAME SELECT * FROM r),
      |x AS (SELECT *,
      |        last_value(p_orderkey IGNORE NULLS) OVER w AS o_orderkey,
      |        last_value(p_totalprice IGNORE NULLS) OVER w AS o_totalprice
      |      FROM u
      |      WINDOW w AS (PARTITION BY user_id ORDER BY t, side, tie
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, event_type, o_orderkey, o_totalprice
      |FROM x WHERE side = 1""".stripMargin
}
