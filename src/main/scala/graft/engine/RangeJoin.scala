package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned range joins — band, point-in-interval, interval-overlap.
  *
  * Spark plans a join whose only condition is an inequality as a
  * BroadcastNestedLoopJoin (small side) or a CartesianProduct: O(n·m)
  * comparisons and, at 100 TB, a plan that never finishes. The
  * published fix (DB2's band-join work, Databricks' range-join hints,
  * the interval-join operator in Flink) is to quantize the range
  * dimension into fixed-width bins so the range predicate becomes an
  * EQUI-join on bin id plus a residual filter: Catalyst then picks a
  * shuffled hash / sort-merge join, both sides partition by bin, and
  * each row meets only the rows whose bins can possibly satisfy the
  * predicate.
  *
  * Correctness rests on one invariant per operator, stated at each
  * method; all three guarantee EXACTLY-ONCE pair emission (no
  * post-join dedup — dedup would be a second shuffle at the blown-up
  * pair grain, the most expensive place in the plan to put one).
  *
  * Scale notes:
  *  - Shuffle volume: points/left rows move once; intervals move once
  *    per covered bin (len/width + 1). Pick `binWidth` near the
  *    typical interval length so the explode factor stays ~2 while
  *    bin-key cardinality stays high enough to spread (width too
  *    large → few hot bin keys; width too small → interval copies).
  *  - Skew: a bin holding a burst (flash-sale day, hot price point)
  *    becomes one oversized shuffle partition; AQE skew-join splits
  *    it because the join is a plain equi-join — exactly the
  *    machinery a nested-loop plan can NOT use.
  *  - The residual predicate is a codegen'd comparison on already
  *    co-located rows — no extra pass.
  */
object RangeJoin {

  private val BinCol = "__range_bin"

  /** Pairs (l, r) with |l.leftVal − r.rightVal| ≤ eps.
    *
    * Left keeps one bin `⌊v/eps⌋`; right explodes to its bin ±1.
    * Invariant: |a−b| ≤ eps ⇒ |⌊a/eps⌋−⌊b/eps⌋| ≤ 1, and the three
    * exploded bins are distinct, so every qualifying pair matches on
    * exactly one bin value — exactly-once without dedup. The 3×
    * copies ride the smaller/probe side: pass it as `right`.
    *
    * Column names of `left` and `right` must be disjoint (rename
    * before calling — Spark cannot disambiguate after the join).
    * `eps` must be > 0; values may be any numeric type (binning is
    * computed in double — exact for integer-valued columns below
    * 2^52, the recommended domain for hash-stable results).
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftVal: String, rightVal: String, eps: Double): DataFrame = {
    require(eps > 0, s"bandJoin: eps must be positive, got $eps")
    val lb = left.withColumn(BinCol,
      floor(col(leftVal) / eps).cast("long"))
    val rBin = floor(col(rightVal) / eps).cast("long")
    val rb = right.withColumn(BinCol,
      explode(array(rBin - 1, rBin, rBin + 1)))
    lb.join(rb, BinCol)
      .where(abs(col(leftVal) - col(rightVal)) <= eps)
      .drop(BinCol)
  }

  /** Pairs (p, iv) with iv.lo ≤ p.point ≤ iv.hi (inclusive ends),
    * all three columns integer-valued (epoch days, epoch seconds —
    * quantize first; integer containment has no float boundary).
    *
    * Points keep one bin; intervals explode over every covered bin
    * (`sequence(⌊lo/w⌋, ⌊hi/w⌋)`). A containing interval covers the
    * point's bin exactly once — exactly-once without dedup. Empty
    * intervals (hi < lo) are dropped up front: they contain nothing,
    * and a descending `sequence` would otherwise fabricate bins.
    *
    * Column names must be disjoint across the two frames.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"pointInInterval: binWidth must be positive")
    val pb = points.withColumn(BinCol,
      floor(col(pointCol).cast("long") / binWidth))
    val ib = intervals
      .where(col(hiCol) >= col(loCol))
      .withColumn(BinCol, explode(sequence(
        floor(col(loCol).cast("long") / binWidth),
        floor(col(hiCol).cast("long") / binWidth))))
    pb.join(ib, BinCol)
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(BinCol)
  }

  /** Pairs (a, b) whose integer intervals overlap:
    * a.lo ≤ b.hi AND b.lo ≤ a.hi (inclusive ends).
    *
    * Both sides explode over covered bins; a pair that overlaps
    * shares every bin in the overlap region, so naive bin-equality
    * would emit it once per shared bin. The first-shared-bin trick
    * (same discipline as the smallest-shared-cell rule in the IVF
    * candidate join, Similarity.scala) restores exactly-once with no
    * dedup: count the pair ONLY in bin max(⌊a.lo/w⌋, ⌊b.lo/w⌋) —
    * overlap guarantees both sides cover that bin, distinct exploded
    * bins guarantee they meet there once.
    *
    * `keys` adds equi-key conjuncts (e.g. same supplier) that ride
    * the shuffle alongside the bin — pass them here rather than
    * filtering after, so partitioning spreads over (keys, bin).
    * Column names must be disjoint across the two frames.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      binWidth: Long, keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, s"intervalOverlap: binWidth must be positive")
    def bins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.where(col(hi) >= col(lo))
        .withColumn(BinCol, explode(sequence(
          floor(col(lo).cast("long") / binWidth),
          floor(col(hi).cast("long") / binWidth))))
    val ab = bins(left, loA, hiA)
    val bb = bins(right, loB, hiB)
    val keyCond = keys.map { case (ka, kb) => col(ka) === col(kb) }
      .foldLeft(ab(BinCol) === bb(BinCol))(_ && _)
    ab.join(bb, keyCond)
      .where(ab(BinCol) === greatest(
          floor(col(loA).cast("long") / binWidth),
          floor(col(loB).cast("long") / binWidth)) &&
        col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .drop(BinCol)
  }

  // ------------------------------------------------------------------
  // Registered queries (SparkEntry) — integer-quantized forms so the
  // DuckDB compare is hash-exact with zero float-boundary risk.
  // ------------------------------------------------------------------

  /** Price cents — p_retailprice has exactly 2 decimals, so
    * round(·×100) is never at a .5 boundary and both engines land on
    * the same integer. */
  private def cents(c: Column): Column =
    round(c * 100).cast("long")

  /** Epoch days of a midnight-aligned timestamp — day arithmetic on
    * integers, immune to the dual ts-encoding and tz pitfalls. */
  private def epochDay(c: Column): Column =
    datediff(c, to_date(lit("1970-01-01"))).cast("long")

  /** Band self-join on part price: unordered pairs of parts within
    * 25 cents of each other, rolled up per brand pair. The naive plan
    * is a 2000² (sf0.01) → 4·10¹⁴ (100 TB) nested loop; the binned
    * plan shuffles each part once (+3× one side) and meets only
    * neighbors. */
  def partPriceBands(spark: SparkSession, dir: String): DataFrame = {
    val part = spark.read.parquet(s"$dir/part.parquet")
    val a = part.select(col("p_partkey").as("a_key"),
      col("p_brand").as("brand_a"), cents(col("p_retailprice")).as("a_cents"))
    val b = part.select(col("p_partkey").as("b_key"),
      col("p_brand").as("brand_b"), cents(col("p_retailprice")).as("b_cents"))
    bandJoin(a, b, "a_cents", "b_cents", 25.0)
      .where(col("a_key") < col("b_key"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("a_cents") - col("b_cents"))).as("sum_gap_cents"))
  }

  val partPriceBandsSql: String =
    """WITH c AS (SELECT p_partkey, p_brand,
      |                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      |           FROM part)
      |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |       COUNT(*) AS n_pairs,
      |       CAST(SUM(ABS(a.cents - b.cents)) AS BIGINT) AS sum_gap_cents
      |FROM c a JOIN c b
      |  ON a.p_partkey < b.p_partkey AND ABS(a.cents - b.cents) <= 25
      |GROUP BY 1, 2""".stripMargin

  /** Band AGGREGATE with the pair enumeration collapsed to the value
    * grain — the band-join analog of the [[inTransitByPriority]]
    * sweep. [[partPriceBands]] enumerates part pairs: its join output
    * is density-quadratic (10× parts in the same price domain → 100×
    * pairs per decade). But `n_pairs` and `sum_gap_cents` are
    * DISTRIBUTIVE over pair multiplicity, so the enumeration is
    * unnecessary: collapse parts to (brand, cents, cnt) cells first —
    * the cell count is bounded by |brands| × |price domain in cents|,
    * a CONSTANT per decade — run the binned band join at the cell
    * grain, and recover pair counts by combinatorics (cnt_a·cnt_b
    * across distinct cells, C(cnt,2) within a cell, gap 0).
    *
    * Exactly-once at the cell grain: the bin trick gives each
    * qualifying ordered cell pair once; keeping the lexicographically
    * smaller (cents, brand) side as `a` keeps each UNORDERED distinct
    * cell pair once. Brand pairs are canonicalized `least/greatest`
    * (key order is meaningless at the collapsed grain), so this is a
    * companion query, not a drop-in twin of [[partPriceBands]].
    *
    * Decade exponent: ×10 (one scan + a domain-bounded join) where
    * the attach form is ×100. The DuckDB oracle computes the NAIVE
    * part-pair join — the hash match is a differential proof of the
    * grain collapse. */
  def partPriceBandsAgg(spark: SparkSession, dir: String): DataFrame = {
    val cells = spark.read.parquet(s"$dir/part.parquet")
      .groupBy(col("p_brand"), cents(col("p_retailprice")).as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val a = cells.select(col("p_brand").as("brand_a"),
      col("cents").as("a_cents"), col("cnt").as("a_cnt"))
    val b = cells.select(col("p_brand").as("brand_b"),
      col("cents").as("b_cents"), col("cnt").as("b_cnt"))
    val cross = bandJoin(a, b, "a_cents", "b_cents", 25.0)
      .where(col("a_cents") < col("b_cents") ||
        (col("a_cents") === col("b_cents") && col("brand_a") < col("brand_b")))
      .select(least(col("brand_a"), col("brand_b")).as("brand_lo"),
        greatest(col("brand_a"), col("brand_b")).as("brand_hi"),
        (col("a_cnt") * col("b_cnt")).as("pairs"),
        (abs(col("a_cents") - col("b_cents")) * col("a_cnt") * col("b_cnt"))
          .as("gap"))
    val within = cells.select(col("p_brand").as("brand_lo"),
      col("p_brand").as("brand_hi"),
      // Column./ is IEEE double division; the product is even, so the
      // long cast is exact and keeps n_pairs integer like the oracle
      (col("cnt") * (col("cnt") - 1) / 2).cast("long").as("pairs"),
      lit(0L).as("gap"))
    cross.unionByName(within)
      .groupBy("brand_lo", "brand_hi")
      .agg(sum("pairs").as("n_pairs"), sum("gap").as("sum_gap_cents"))
      .where(col("n_pairs") > 0)
  }

  val partPriceBandsAggSql: String =
    """WITH c AS (SELECT p_partkey, p_brand,
      |                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
      |           FROM part)
      |SELECT LEAST(a.p_brand, b.p_brand) AS brand_lo,
      |       GREATEST(a.p_brand, b.p_brand) AS brand_hi,
      |       COUNT(*) AS n_pairs,
      |       CAST(SUM(ABS(a.cents - b.cents)) AS BIGINT) AS sum_gap_cents
      |FROM c a JOIN c b
      |  ON a.p_partkey < b.p_partkey AND ABS(a.cents - b.cents) <= 25
      |GROUP BY 1, 2""".stripMargin

  /** Deterministic synthetic transit interval for a lineitem:
    * [shipdate, shipdate + 1 + (7·orderkey + linenumber) mod 28] days
    * — the testdata has no receiptdate, so the interval is derived,
    * seeded by the row's own keys (SQL-expressible on both engines,
    * positive operands so % semantics agree). */
  private def transitIntervals(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        epochDay(col("l_shipdate")).as("iv_lo"),
        (epochDay(col("l_shipdate")) + lit(1) +
          (col("l_orderkey") * 7 + col("l_linenumber")) % 28).as("iv_hi"))

  /** The shared difference-array coverage sweep: ±1 count and ±`delta`
    * payload at iv_lo / iv_hi+1, day-grain aggregated, dense calendar
    * axis, one running-sum window → (day, cum_c, cum_q). The single-
    * task window is safe because the axis is CALENDAR-sized, never
    * interval-count-sized (the inTransit rationale); `zero` supplies
    * the payload's typed zero for the left-join coalesce. Both sweep
    * consumers ([[inTransitByPriority]], [[marchTransitAttach]]) ride
    * this one pipeline so a fix cannot land in only one copy. */
  private def coverageSweep(iv: DataFrame,
      delta: org.apache.spark.sql.Column,
      zero: org.apache.spark.sql.Column): DataFrame = {
    val deltas = iv.select(col("iv_lo").as("day"), lit(1L).as("dc"),
        delta.as("dq"))
      .unionByName(iv.select((col("iv_hi") + 1).as("day"),
        lit(-1L).as("dc"), (-delta).as("dq")))
    val dd = deltas.groupBy("day")
      .agg(sum("dc").as("dc"), sum("dq").as("dq"))
    val axis = dd.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    axis.join(dd, Seq("day"), "left")
      .select(col("day"),
        sum(coalesce(col("dc"), lit(0L))).over(w).as("cum_c"),
        sum(coalesce(col("dq"), zero)).over(w).as("cum_q"))
  }

  /** Point-in-interval AGGREGATE: how many lineitem shipments were in
    * transit on each order's placement day, per order priority — with
    * the pair enumeration REWRITTEN AWAY.
    *
    * The naive form (and the DuckDB oracle, making the hash match a
    * differential proof of this rewrite) joins every order day to
    * every containing interval: ~5.5M pairs at sf0.01, ~540M at
    * sf0.1, ×100 per decade — measured 344 s at sf0.1 through the
    * binned join, and no join strategy fixes a quadratic OUTPUT. But
    * a distributive aggregate over containing intervals never needs
    * the pairs: it is a difference-array sweep (the classic
    * interval-stabbing prefix sum). Each interval contributes +1/+qty
    * at day lo and −1/−qty at day hi+1; the running sum over the day
    * axis is exactly (count, qty-sum) of intervals covering each day;
    * points then equi-join the DAY-GRAIN coverage table and aggregate.
    *
    * Scale shape: one interval scan → day-grain partial agg (the
    * shuffle carries ≤ 2 rows per interval, combined map-side to the
    * day grain); the prefix sum runs over the DENSE CALENDAR AXIS —
    * bounded by the time span (~2.5k days here, 36.5k for a century),
    * never by data volume, so the single-task window is constant-size
    * at any corpus scale; the coverage table broadcasts to the point
    * side (calendar-sized), so points never shuffle at all. 344 s →
    * 1.5 s at sf0.1, and the decade exponent drops from ×100 to ×10
    * (linear in rows). Decimal-exact sums throughout.
    *
    * Use [[pointInInterval]] when you need the PAIRS themselves
    * (attachment — see [[marchTransitAttach]]); use this sweep shape
    * whenever the downstream is a distributive aggregate. */
  def inTransitByPriority(spark: SparkSession, dir: String): DataFrame = {
    val iv = transitIntervals(spark, dir)
    val cov = coverageSweep(iv, col("l_quantity").cast("decimal(30,2)"),
      lit(0).cast("decimal(30,2)"))
    val pts = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"), epochDay(col("o_orderdate")).as("day"))
    pts.join(broadcast(cov), Seq("day"), "left")
      .groupBy("o_orderpriority")
      .agg(sum(coalesce(col("cum_c"), lit(0L))).as("n_pairs"),
        sum(coalesce(col("cum_q"), lit(0).cast("decimal(38,2)")))
          .cast("double").as("sum_qty"))
      // cum_c ≥ 0 per day, so n_pairs = 0 ⟺ the group has no covering
      // pairs at all ⟺ the oracle's inner join omits the group. This
      // filter pins the left-join form to the oracle's group-presence
      // semantics on sparse inputs (same guard as partPriceBandsAgg).
      .where(col("n_pairs") > 0)
  }

  val inTransitByPrioritySql: String =
    """WITH iv AS (
      |  SELECT l_quantity,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) AS lo,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) + 1 + ((l_orderkey * 7 + l_linenumber) % 28)
      |           AS hi
      |  FROM lineitem),
      |pt AS (
      |  SELECT o_orderpriority,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
      |              AS BIGINT) AS d
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n_pairs,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
      |         AS sum_qty
      |FROM pt JOIN iv ON pt.d BETWEEN iv.lo AND iv.hi
      |GROUP BY 1""".stripMargin

  /** Point-in-interval ATTACHMENT: the pairs themselves, for a
    * bounded slice — orders placed in March 1997 attached to the
    * transit intervals covering their day, rolled up per day. This is
    * [[pointInInterval]] on the board: the slice predicates push down
    * to BOTH scans (orders: one month; lineitem: only intervals that
    * can overlap it), so the enumeration is proportional to the
    * slice. Pair enumeration is inherently output-quadratic per
    * decade (both sides densify) — the labeled-quadratic class, like
    * the exact-pair dedup oracles; the aggregate twin
    * ([[inTransitByPriority]]) is the scale path when pairs are not
    * needed. */
  def marchTransitAttach(spark: SparkSession, dir: String): DataFrame = {
    // Output is DAY-GRAIN aggregate, so the pair enumeration is
    // rewritten away (the inTransitByPriority sweep — the r12 sf1
    // board measured the binned pair join at 207 s / 81× per decade
    // here: point AND interval density both grow with SF over a fixed
    // calendar span, so within-bin pair volume is quadratic in SF; no
    // join strategy fixes a quadratic intermediate the consumer never
    // looks at). Coverage cum (count, qty-cents) per day via the
    // difference-array sweep; per March day, n_pairs = n_points ×
    // covering-count and sum_qty = n_points × covering-cents / 100 —
    // cents keep every product exact in BIGINT; the /100 runs in
    // DECIMAL (exact at scale 2 for any BIGINT product — no 2^53
    // ceiling) so the single final double cast is the only rounding
    // step, equal to the oracle's exact-DECIMAL-sum-cast-to-double
    // bit for bit at every SF. The
    // DuckDB oracle still ENUMERATES the pairs: the hash match is the
    // differential proof of the rewrite. q_interval_join keeps the
    // pair-enumerating pointInInterval covered at bench scale.
    val lo = 9921L // 1997-03-01 epoch day
    val hi = 9951L // 1997-03-31
    val iv = transitIntervals(spark, dir)
      .where(col("iv_hi") >= lo && col("iv_lo") <= hi)
    val qc = (col("l_quantity").cast("decimal(30,2)") * 100).cast("long")
    val cov = coverageSweep(iv, qc, lit(0L))
      .withColumnRenamed("cum_q", "cum_qc")
    val pts = spark.read.parquet(s"$dir/orders.parquet")
      .select(epochDay(col("o_orderdate")).as("day"))
      .where(col("day").between(lo, hi))
      .groupBy("day").agg(count(lit(1)).as("n_pts"))
    pts.join(broadcast(cov), Seq("day"), "left")
      .select(col("day"),
        (col("n_pts") * coalesce(col("cum_c"), lit(0L))).as("n_pairs"),
        ((col("n_pts") * coalesce(col("cum_qc"), lit(0L)))
          .cast("decimal(38,0)") / 100).cast("double").as("sum_qty"))
      // inner-join group-presence semantics (the sibling sweeps' rule)
      .where(col("n_pairs") > 0)
  }

  val marchTransitAttachSql: String =
    """WITH iv AS (
      |  SELECT l_quantity,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) AS lo,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) + 1 + ((l_orderkey * 7 + l_linenumber) % 28)
      |           AS hi
      |  FROM lineitem),
      |pt AS (
      |  SELECT CAST(datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
      |              AS BIGINT) AS d
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-03-01'
      |    AND o_orderdate < TIMESTAMP '1997-04-01')
      |SELECT pt.d AS day, COUNT(*) AS n_pairs,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
      |         AS sum_qty
      |FROM pt JOIN iv ON pt.d BETWEEN iv.lo AND iv.hi
      |GROUP BY 1""".stripMargin

  /** Interval-overlap self-join: per supplier, unordered pairs of its
    * shipments whose transit windows overlap — concurrent-load
    * analysis. The supplier equi-key rides the shuffle with the bin;
    * the first-shared-bin rule keeps each pair exactly once. */
  def supplierTransitOverlaps(spark: SparkSession, dir: String): DataFrame = {
    // call-site scan spread (guide §2.5; Tables.spread scaladoc): the
    // interval derivation + bin explode + shuffle-write of BOTH join
    // sides otherwise run in the two single-task scans of the
    // one-row-group testdata layout. Spreading by the supplier key —
    // one of the join keys — also lets the self-join reuse the
    // spread partitioning (subset co-partitioning), so the exchange
    // buys parallelism without adding a net shuffle at scale.
    val iv = graft.core.Tables.spread(transitIntervals(spark, dir),
      "l_suppkey")
    val a = iv.select(col("l_suppkey").as("a_supp"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("a_line"),
      col("iv_lo").as("a_lo"), col("iv_hi").as("a_hi"))
    val b = iv.select(col("l_suppkey").as("b_supp"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("b_line"),
      col("iv_lo").as("b_lo"), col("iv_hi").as("b_hi"))
    intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 32L,
        keys = Seq(("a_supp", "b_supp")))
      .where(col("a_line") < col("b_line"))
      .groupBy(col("a_supp").as("suppkey"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  val supplierTransitOverlapsSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey,
      |         l_orderkey * 10 + l_linenumber AS line_id,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) AS lo,
      |         CAST(datediff('day', TIMESTAMP '1970-01-01', l_shipdate)
      |              AS BIGINT) + 1 + ((l_orderkey * 7 + l_linenumber) % 28)
      |           AS hi
      |  FROM lineitem)
      |SELECT a.l_suppkey AS suppkey, COUNT(*) AS n_overlaps
      |FROM iv a JOIN iv b
      |  ON a.l_suppkey = b.l_suppkey AND a.line_id < b.line_id
      | AND a.lo <= b.hi AND b.lo <= a.hi
      |GROUP BY 1""".stripMargin
}
