package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.engine.Relational

class RelationalSpec extends AnyFunSuite with SharedSpark {

  test("events daily agg groups correctly and counts match raw data") {
    val agg = Relational.eventsDailyAgg(spark, sf).cache()
    val total = agg.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sf).count())
    // distinct users per group never exceeds events per group
    assert(agg.where(col("distinct_users") > col("n_events")).count() === 0)
  }

  test("HLL distinct estimate within 3*rsd of exact (SURVEY §5.3 band)") {
    val exact = Relational.eventsDailyAgg(spark, sf)
      .select(col("event_type"), col("day"),
        col("distinct_users").as("exact_n"))
    val approx = Relational.eventsDailyAggApprox(spark, sf)
      .select(col("event_type"), col("day"),
        col("distinct_users").as("approx_n"))
    val joined = exact.join(approx, Seq("event_type", "day"))
    val bad = joined.where(
      abs(col("approx_n") - col("exact_n")) >
        greatest(lit(1.0), col("exact_n") * 3 * 0.05)).count()
    assert(bad === 0, "HLL estimate outside 3*rsd band")
  }

  test("argmax-per-group (W1+P4) equals naive max-join implementation") {
    val viaWindow = Relational.latestBestOrderPerCustomer(spark, sf)
    val o = Tables.orders(spark, sf)
    val best = o.groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice"), col("o_orderdate"),
        col("o_orderkey"))).as("b"))
      .select(col("o_custkey"), col("b.o_orderkey"), col("b.o_totalprice"),
        col("b.o_orderdate"))
    // tie-break differs (orderBy o_orderkey asc vs struct-max takes max
    // key) — compare on (custkey, totalprice, orderdate) which the window
    // fully determines, and row counts.
    assert(viaWindow.count() === best.count())
    val a = viaWindow.select("o_custkey", "o_totalprice", "o_orderdate")
    val b = best.select("o_custkey", "o_totalprice", "o_orderdate")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("broadcast left-semi join equals driver isin round-trip (P2)") {
    val semi = Relational.semiJoinActiveUsers(spark, sf)
    // the reference's way: collect the list, push back as isin predicate
    val bigSpenders = Tables.orders(spark, sf)
      .where(col("o_totalprice") > 300000.0)
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSeq
    val viaIsin = Tables.events(spark, sf)
      .where(col("user_id").isin(bigSpenders: _*))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("event_type")).as("n_types"))
    assert(semi.exceptAll(viaIsin).count() === 0)
    assert(viaIsin.exceptAll(semi).count() === 0)
  }

  test("top-k fuses to TakeOrderedAndProject (O1 plan shape)") {
    val plan = Relational.topKByBestDay(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k fusion, got:\n$plan")
    // rank-limit pushdown: row_num = 1 must become a WindowGroupLimit
    // BELOW the window exchange (per-partition top-1 before shuffle), so
    // the window shuffle moves one row per (group, partition), not the
    // whole aggregate — the shape that keeps this O(groups) at 100 TB
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown, got:\n$plan")
  }

  test("approx percentiles within rank-error band (scale variant)") {
    // The sketch guarantee is on RANK, not value (exact `percentile`
    // interpolates; approx returns a real element — values can differ
    // arbitrarily across a sparse tail gap). Check: the fraction of
    // values below/at the approx quantile brackets the target fraction
    // within accuracy=1e-4 plus discreteness 1/n.
    val approx = Relational.valuePercentilesApprox(spark, sf)
    val events = Tables.events(spark, sf).select("event_type", "value")
    val joined = events.join(broadcast(approx), Seq("event_type"))
    val ranks = joined.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      (sum(when(col("value") < col("q50"), 1).otherwise(0)) /
        count(lit(1))).as("below_q50"),
      (sum(when(col("value") <= col("q50"), 1).otherwise(0)) /
        count(lit(1))).as("at_q50"),
      (sum(when(col("value") < col("q99"), 1).otherwise(0)) /
        count(lit(1))).as("below_q99"),
      (sum(when(col("value") <= col("q99"), 1).otherwise(0)) /
        count(lit(1))).as("at_q99"))
    val tol = lit(1e-4) + lit(2.0) / col("n")
    val bad = ranks.where(
      col("below_q50") > lit(0.5) + tol || col("at_q50") < lit(0.5) - tol ||
        col("below_q99") > lit(0.99) + tol || col("at_q99") < lit(0.99) - tol)
      .count()
    assert(bad === 0, "approx_percentile rank outside accuracy band")
  }

  test("filter+projection reach the parquet scan (pushdown)") {
    val plan = Relational.filterEqProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]")
      || plan.contains("EqualTo(l_returnflag,R)"),
      s"filter not pushed to scan:\n$plan")
    assert(!plan.contains("l_comment"), "unexpected column read")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double"),
      s"projection not pruned at scan:\n$plan")
  }

  test("dimension joins broadcast (no shuffle for nation/region)") {
    val plan = Relational.revenueByRegion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
