package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LinkRank

class LinkRankSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  /** Naive single-threaded reference: same integer-mass recurrence
    * over a Map, independent of every Spark operator the engine path
    * uses (join order, partial aggregation, left-join reinstatement). */
  private def naive(ids: Seq[Long], k: Int): Map[Long, Long] = {
    val exists = ids.toSet
    val edges = ids.flatMap { u =>
      Seq(u % 16, (u * 31 + 128) % 1024, (u * 31 + 255) % 1024,
        (u * 31 + 382) % 1024)
        .filter(v => v != u && exists(v)).map(v => (u, v))
    }
    val od = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var mass = ids.map(_ -> 1000000L).toMap
    for (_ <- 1 to k) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => mass(u) * 85 / (100 * od(u)) }.sum
      }
      mass = ids.map(v => v -> (150000L + in.getOrElse(v, 0L))).toMap
    }
    mass
  }

  test("linkRank matches the naive integer-mass reference exactly") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    val want = naive(ids, 4)
    val got = LinkRank.linkRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("every node appears once; orphans sit at the base mass") {
    val df = LinkRank.linkRank(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(df.count() === n)
    assert(df.select(countDistinct("doc_id")).head.getLong(0) === n)
    assert(df.agg(min("mass")).head.getLong(0) === 150000L)
  }

  test("hub tier accumulates rank: a % 16 hub outranks the median") {
    val ranks = LinkRank.linkRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hubMax = (0L until 16L).flatMap(ranks.get).max
    val masses = ranks.values.toSeq.sorted
    val median = masses(masses.size / 2)
    assert(hubMax > 10 * median,
      s"hubMax=$hubMax median=$median — hub tier should dominate")
  }

  /** Naive trust-rank reference: same recurrence with seed-gated
    * init and teleport mass. */
  private def naiveTrust(rows: Seq[(Long, String)], seed: String,
      k: Int): Map[Long, Long] = {
    val ids = rows.map(_._1)
    val isSeed = rows.filter(_._2 == seed).map(_._1).toSet
    val exists = ids.toSet
    val edges = ids.flatMap { u =>
      Seq(u % 16, (u * 31 + 128) % 1024, (u * 31 + 255) % 1024,
        (u * 31 + 382) % 1024)
        .filter(v => v != u && exists(v)).map(v => (u, v))
    }
    val od = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var mass = ids.map(v => v -> (if (isSeed(v)) 1000000L else 0L)).toMap
    for (_ <- 1 to k) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => mass(u) * 85 / (100 * od(u)) }.sum
      }
      mass = ids.map(v => v ->
        ((if (isSeed(v)) 150000L else 0L) + in.getOrElse(v, 0L))).toMap
    }
    mass
  }

  test("trustRank matches the seed-gated naive reference exactly") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = naiveTrust(rows, "src0", 4)
    val got = LinkRank.trustRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("trust mass is zero exactly off the seed-reachable set") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = LinkRank.trustRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every node gets a row; seeds carry at least the teleport mass;
    // and the zero-mass set is nonempty on real data (some docs are
    // outside the seeds' 4-round out-neighborhood)
    assert(got.size === rows.size)
    val seeds = rows.filter(_._2 == "src0").map(_._1)
    assert(seeds.nonEmpty && seeds.forall(got(_) >= 150000L))
    assert(got.values.exists(_ == 0L),
      "expected some docs unreachable from the seed set in 4 rounds")
    // link rank would give every node >= base mass — trust rank's
    // zero tail is the spam-resistance property
    val lr = LinkRank.linkRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lr.values.forall(_ >= 150000L))
  }

  test("linkRankTop is the total-order head of the full frame") {
    val full = LinkRank.linkRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, m) => (-m, id) }.take(20).toSeq
    val top = LinkRank.linkRankTop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top === full)
  }
}
