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
}
