package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Property-based invariants (SURVEY §5.4): argmax-per-group equals a
  * naive implementation, aggregation is arrival-order independent, and
  * salting never changes results — over ScalaCheck-generated inputs
  * (fixed seed: deterministic CI). scalatestplus isn't on the offline
  * classpath, so generators are driven directly. */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  val rowGen: Gen[(Int, Int, Double)] = for {
    key <- Gen.choose(0, 5)
    ord <- Gen.choose(0, 20)
    v <- Gen.choose(-1000, 1000).map(_ / 100.0)
  } yield (key, ord, v)

  /** n deterministic samples of `g`. */
  def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  val datasets: Seq[List[(Int, Int, Double)]] =
    samples(Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, rowGen)), 8)

  test("property: window argmax-per-group == naive groupBy-max join") {
    import org.apache.spark.sql.expressions.Window
    datasets.foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"ord".desc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .where($"rn" === 1).select("k", "v", "ord")
      val naive = df.groupBy("k")
        .agg(max(struct($"v", $"ord")).as("b"))
        .select($"k", $"b.v", $"b.ord")
      assert(viaWindow.exceptAll(naive).count() === 0, s"rows=$rows")
      assert(naive.exceptAll(viaWindow).count() === 0, s"rows=$rows")
    }
  }

  test("property: aggregation is partition/arrival-order independent") {
    datasets.zipWithIndex.foreach { case (rows, i) =>
      val parts = 1 + (i % 7)
      val a = rows.toDF("k", "ord", "v").repartition(parts)
      val b = new scala.util.Random(i).shuffle(rows).toDF("k", "ord", "v")
        .repartition(1)
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").agg(
          count(lit(1)).as("n"),
          sum($"v".cast("decimal(20,2)")).cast("double").as("s"),
          max($"v").as("mx"), min($"v").as("mn"))
      assert(agg(a).exceptAll(agg(b)).count() === 0, s"rows=$rows")
      assert(agg(b).exceptAll(agg(a)).count() === 0, s"rows=$rows")
    }
  }

  test("property: salted aggregation == plain aggregation") {
    datasets.zipWithIndex.foreach { case (rows, i) =>
      val buckets = 2 + (i % 15)
      val df = rows.toDF("k", "ord", "v")
      val plain = df.groupBy($"k")
        .agg(count(lit(1)).as("n_rows"),
          sum($"v".cast("decimal(30,2)")).cast("double").as("sum_value"))
      val salted = Skew.saltedCountSum(df, "k", "v", buckets)
      assert(plain.exceptAll(salted).count() === 0, s"rows=$rows")
      assert(salted.exceptAll(plain).count() === 0, s"rows=$rows")
    }
  }

  test("property: jaccard pairs respect doc_a < doc_b and [tau, 1]") {
    val pairs = graft.ops.Dedup.ngramJaccardPairs(spark, sf, tau = 0.5)
    assert(pairs.where($"doc_a" >= $"doc_b").count() === 0)
    assert(pairs.where($"jaccard" < 0.5 || $"jaccard" > 1.0).count() === 0)
  }

  test("property: connected components are closed, labeled by minimum, " +
    "and edge-connected nodes share a label") {
    // random sparse graphs: nodes 0..n-1, m random edges
    val graphGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(0, 50)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a.toLong, b.toLong))
    } yield (n, edges)
    samples(graphGen, 6).foreach { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("node")
      val edgeDf = edges.toDF("src", "dst")
      val labels = graft.ops.Components
        .connectedComponents(nodes, edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every node labeled; label is a member of its own component
      assert(labels.keySet === (0L until n.toLong).toSet)
      labels.foreach { case (_, c) => assert(labels(c) === c,
        s"label $c is not its own root: $labels edges=$edges") }
      // edge endpoints share a label
      edges.foreach { case (a, b) =>
        assert(labels(a) === labels(b),
          s"edge ($a,$b) split across components: $labels") }
      // label = min of the member set
      labels.groupBy(_._2).foreach { case (c, members) =>
        assert(members.keys.min === c,
          s"component $c not labeled by its minimum: $labels") }
    }
  }

  test("property: shard packing preserves order, budget, and totals") {
    val weightsGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 500)))
    samples(weightsGen, 6).zipWithIndex.foreach { case (ws, i) =>
      val budget = 400L + i * 137
      val df = ws.zipWithIndex.map { case (w, id) => (id.toLong, w) }
        .toDF("doc_id", "w0")
      val packed = graft.ops.Pack
        .packIntoShards(df, "doc_id", $"w0", budget, numParts = 1 + (i % 5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1)
      // cumulative sums are the exact prefix sums in doc_id order
      var cum = 0L
      packed.foreach { case (_, w, c, _) => cum += w; assert(c === cum) }
      // shard ids are non-decreasing and start at 0
      assert(packed.head._4 === 0L)
      assert(packed.sliding(2).forall(p =>
        p.length < 2 || p(1)._4 >= p(0)._4))
      // a shard never exceeds the budget except via its final document
      packed.groupBy(_._4).foreach { case (_, docs) =>
        val total = docs.map(_._2).sum
        assert(total - docs.last._2 < budget,
          s"shard overfilled before its last doc: $docs budget=$budget")
      }
      spark.catalog.clearCache()
    }
  }
}
