package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Binned plans must be equi-joins: a nested-loop or cartesian node
    * means the binning failed to produce an equi-key. */
  private def assertEquiJoinPlan(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ----- bandJoin -----

  test("bandJoin equals the naive cross form, including eps boundary") {
    val a = Seq((1L, 10.0), (2L, 10.5), (3L, 11.0), (4L, 20.0))
      .toDF("a_id", "a_v")
    val b = Seq((10L, 10.4), (11L, 10.99), (12L, 19.5), (13L, 25.0))
      .toDF("b_id", "b_v")
    val eps = 0.5
    val got = RangeJoin.bandJoin(a, b, "a_v", "b_v", eps)
      .select("a_id", "b_id")
    val want = a.crossJoin(b)
      .where(abs(col("a_v") - col("b_v")) <= eps)
      .select("a_id", "b_id")
    assert(sortedRows(got) === sortedRows(want))
    // the exact-eps pair (10.0, 10.5) and the cross-bin pair
    // (10.5, 10.99) are both present
    val pairs = got.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 11L)))
    assertEquiJoinPlan(got)
  }

  test("bandJoin emits each qualifying pair exactly once") {
    // values straddling a bin edge: 0.9 and 1.1 sit in bins 0 and 1
    // with eps=1 — adjacent-bin match must fire once, not twice
    val a = Seq((1L, 0.9)).toDF("a_id", "a_v")
    val b = Seq((2L, 1.1), (3L, 0.95)).toDF("b_id", "b_v")
    val got = RangeJoin.bandJoin(a, b, "a_v", "b_v", 1.0)
    assert(got.count() === 2L)
    assert(got.select("a_id", "b_id").distinct().count() === 2L)
  }

  // ----- pointInInterval -----

  test("pointInInterval equals naive, inclusive ends, drops empty intervals") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 64L), (4L, 100L))
      .toDF("p_id", "p")
    val ivs = Seq(
      (10L, 5L, 10L),   // hits points at both inclusive ends
      (11L, 0L, 200L),  // spans many bins (binWidth 32)
      (12L, 63L, 65L),  // straddles the 64 bin edge
      (13L, 50L, 40L))  // empty: hi < lo, must vanish
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", ivs, "lo", "hi", 32L)
      .select("p_id", "iv_id")
    val want = points.crossJoin(ivs)
      .where(col("p").between(col("lo"), col("hi")))
      .select("p_id", "iv_id")
    assert(sortedRows(got) === sortedRows(want))
    val pairs = got.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 10L)),
      "inclusive lo and hi ends must both match")
    assert(pairs.contains((3L, 12L)), "bin-edge straddle must match")
    assert(!pairs.exists(_._2 == 13L), "empty interval must be dropped")
    // multi-bin interval matches each contained point exactly once
    assert(got.where(col("iv_id") === 11L).count() === 4L)
    assertEquiJoinPlan(got)
  }

  // ----- intervalOverlap -----

  test("intervalOverlap equals naive with exactly-once emission") {
    val a = Seq(
      (1L, 0L, 100L),   // covers bins 0..3 (binWidth 32)
      (2L, 40L, 45L),
      (3L, 200L, 210L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq(
      (10L, 90L, 300L), // overlaps 1 (in two shared bins) and 3
      (11L, 45L, 45L),  // point-interval touching 1 and 2 at the end
      (12L, 101L, 150L)) // adjacent to 1, must NOT match (101 > 100)
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", 32L)
      .select("a_id", "b_id")
    val want = a.crossJoin(b)
      .where(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id")
    assert(sortedRows(got) === sortedRows(want))
    val counted = got.groupBy("a_id", "b_id").count()
      .where(col("count") > 1).count()
    assert(counted === 0L, "a pair surfaced in more than one shared bin")
    val pairs = got.as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)), "multi-shared-bin overlap")
    assert(pairs.contains((2L, 11L)), "inclusive-end touch")
    assert(!pairs.contains((1L, 12L)), "adjacent non-overlap excluded")
    assertEquiJoinPlan(got)
  }

  test("intervalOverlap honors equi-keys in the join") {
    val a = Seq((1L, "s1", 0L, 10L), (2L, "s2", 0L, 10L))
      .toDF("a_id", "a_k", "a_lo", "a_hi")
    val b = Seq((10L, "s1", 5L, 15L)).toDF("b_id", "b_k", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", 32L,
        keys = Seq(("a_k", "b_k")))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)), "cross-key pair must not match")
  }

  test("partPriceBandsAgg equals the naive pair enumeration at the " +
    "canonical brand-pair grain") {
    val dir = sf
    val part = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
    val naive = part.as("a").join(part.as("b"),
        col("a.p_partkey") < col("b.p_partkey") &&
          abs(col("a.cents") - col("b.cents")) <= 25)
      .groupBy(least(col("a.p_brand"), col("b.p_brand")).as("brand_lo"),
        greatest(col("a.p_brand"), col("b.p_brand")).as("brand_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("a.cents") - col("b.cents"))).as("sum_gap_cents"))
    val got = RangeJoin.partPriceBandsAgg(spark, dir)
    assert(sortedRows(got) === sortedRows(naive))
    assertEquiJoinPlan(got)
  }

  // ----- registered queries vs their naive forms on real data -----

  test("q_band_join / q_interval_join / q_interval_overlap match naive " +
    "forms at sf0.001") {
    val dir = sf
    val part = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_brand"),
        round(col("p_retailprice") * 100).cast("long").as("cents"))
    val naiveBand = part.as("a").join(part.as("b"),
        col("a.p_partkey") < col("b.p_partkey") &&
          abs(col("a.cents") - col("b.cents")) <= 25)
      .groupBy(col("a.p_brand").as("brand_a"), col("b.p_brand").as("brand_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("a.cents") - col("b.cents"))).as("sum_gap_cents"))
    assert(sortedRows(RangeJoin.partPriceBands(spark, dir)) ===
      sortedRows(naiveBand))

    val got2 = RangeJoin.inTransitByPriority(spark, dir)
    val iv = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_quantity"),
      datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
        .cast("long").as("lo"),
      (datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long")
        + 1 + (col("l_orderkey") * 7 + col("l_linenumber")) % 28).as("hi"))
    val pt = spark.read.parquet(s"$dir/orders.parquet").select(
      col("o_orderpriority"),
      datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
        .cast("long").as("d"))
    val naive2 = pt.join(iv, col("d").between(col("lo"), col("hi")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_quantity").cast("decimal(30,2)")).cast("double")
          .as("sum_qty"))
    assert(sortedRows(got2) === sortedRows(naive2))
    assertEquiJoinPlan(got2)

    // attachment slice: binned pairs over March 1997 vs naive
    val gotA = RangeJoin.marchTransitAttach(spark, dir)
    val naiveA = pt.where(col("d").between(9921L, 9951L))
      .join(iv, col("d").between(col("lo"), col("hi")))
      .groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("l_quantity").cast("decimal(30,2)")).cast("double")
          .as("sum_qty"))
    assert(sortedRows(gotA) === sortedRows(naiveA))
    assertEquiJoinPlan(gotA)

    val got3 = RangeJoin.supplierTransitOverlaps(spark, dir)
    val ivk = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_suppkey"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("line_id"),
      datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
        .cast("long").as("lo"),
      (datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long")
        + 1 + (col("l_orderkey") * 7 + col("l_linenumber")) % 28).as("hi"))
    val naive3 = ivk.as("a").join(ivk.as("b"),
        col("a.l_suppkey") === col("b.l_suppkey") &&
          col("a.line_id") < col("b.line_id") &&
          col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
      .groupBy(col("a.l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_overlaps"))
    assert(sortedRows(got3) === sortedRows(naive3))
    assertEquiJoinPlan(got3)
  }
}
