package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Spans

/** Duplicated-span detection/removal (ExactSubstr grain, Lee et al.
  * 2022): planted boilerplate across docs, within-doc repeats, merge
  * of overlapping windows into maximal spans, and the despan surgery
  * edges (untouched docs pass through verbatim, fully-covered docs
  * keep an empty clean_text). */
class SpansSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  // 10-token boilerplate shared by docs 1 and 2 at different offsets;
  // doc 3 is clean; doc 4 repeats its own 8-token run twice; doc 5 is
  // shorter than k.
  private val boiler = (1 to 10).map(i => s"B$i").mkString(" ")
  private val rerun = (1 to 8).map(i => s"R$i").mkString(" ")
  private def corpus = Seq(
    (1L, s"u1 u2 u3 $boiler t1 t2"),
    (2L, s"$boiler v1 v2 v3 v4 v5"),
    (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
    (4L, s"$rerun m1 m2 $rerun"),
    (5L, "s1 s2 s3")
  ).toDF("doc_id", "text")

  test("duplicatedSpans: cross-doc boilerplate found at each offset, " +
    "maximal (windows merged), clean docs and short docs absent") {
    val got = Spans.duplicatedSpansFor(corpus, k = 8, minCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    // doc 1: boiler at token 3..12 -> one span (3, 10)
    // doc 2: boiler at 0..9 -> (0, 10)
    // doc 4: R-run at 0..7 and at 10..17 -> two spans of 8
    assert(got.toSeq === Seq(
      (1L, 3L, 10L), (2L, 0L, 10L), (4L, 0L, 8L), (4L, 10L, 8L)))
  }

  test("despan: spans cut, order kept, untouched docs verbatim, " +
    "fully-covered doc keeps empty clean_text") {
    val fullCover = Seq(
      (10L, boiler), (11L, boiler)).toDF("doc_id", "text")
    val got = Spans.despanFor(corpus.union(fullCover), k = 8, minCount = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got(1L) === (("u1 u2 u3 t1 t2", 10L)))
    assert(got(2L) === (("v1 v2 v3 v4 v5", 10L)))
    assert(got(3L) === (("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12", 0L)))
    assert(got(4L) === (("m1 m2", 16L)))
    assert(got(5L) === (("s1 s2 s3", 0L)))
    // the 10-token docs are fully covered: kept as rows, text emptied
    assert(got(10L) === (("", 10L)))
    assert(got(11L) === (("", 10L)))
  }

  test("despan: removal is exactly the span token count " +
    "(n_removed + kept tokens = original tokens) on the sf corpus") {
    val docs = graft.core.Tables.documents(spark, sf)
    val before = docs.selectExpr("doc_id",
      "size(split(text, ' ')) AS n0")
    val after = Spans.despanFor(docs).selectExpr("doc_id",
      "IF(clean_text = '', 0, size(split(clean_text, ' '))) AS n1",
      "n_removed")
    val bad = before.join(after, "doc_id")
      .where(org.apache.spark.sql.functions.expr("n0 != n1 + n_removed"))
      .count()
    assert(bad === 0L)
  }

  test("despan: a window that only becomes duplicated at minCount=2 " +
    "survives minCount=3") {
    val spans3 = Spans.duplicatedSpansFor(corpus, k = 8, minCount = 3)
    assert(spans3.count() === 0L)
  }
}
