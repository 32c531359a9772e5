package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Quantize, Similarity}

/** Product-quantization ANN: codebook shape, encode determinism and
  * plan shape, ADC+rerank recall vs the brute-force twin. */
class QuantizeSpec extends AnyFunSuite with SharedSpark {

  private lazy val corpus =
    Similarity.normalized(spark, sf).select("vec_id", "vec").cache()

  test("pqCodebooks: m x ksub centroids of the subspace dimension") {
    val books = Quantize.pqCodebooks(corpus, m = 8, ksub = 16).collect()
    assert(books.length === 8 * 16)
    val bySub = books.groupBy(_.getInt(0))
    assert(bySub.keySet === (0 until 8).toSet)
    bySub.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (0 until 16))
      rs.foreach(r => assert(r.getSeq[Double](2).length === 64 / 8))
    }
  }

  test("pqEncode: one code row per vector, m codes in [0, ksub), " +
    "deterministic across runs") {
    val packed = Quantize.packBooks(
      Quantize.pqCodebooks(corpus, m = 8, ksub = 16)).localCheckpoint()
    def run() = Quantize.pqEncode(corpus, packed).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    val a = run()
    assert(a.length === corpus.count())
    a.foreach { case (_, codes) =>
      assert(codes.length === 8)
      codes.foreach(c => assert(c >= 0 && c < 16))
    }
    assert(a.toSeq === run().toSeq)
  }

  test("pqEncode plan: broadcast only — the corpus never shuffles") {
    val packed = Quantize.packBooks(
      Quantize.pqCodebooks(corpus, m = 8, ksub = 16)).localCheckpoint()
    val plan = Quantize.pqEncode(corpus, packed)
      .queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"PQ encode should be shuffle-free, found: $shuffles")
  }

  test("pqRecall gate: aggregate recall >= 0.9 (the q_ann_pq_recall " +
    "driver row) and a 0.8 per-query floor") {
    val perQ = Quantize.pqRecallPerQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(perQ.length === 10)
    perQ.foreach { case (q, hits) =>
      assert(hits >= 8L, s"query $q PQ hits $hits below the 0.8 floor")
    }
    val gate = Quantize.pqRecall(spark, sf).collect()
    assert(gate.length === 1)
    assert(gate(0).getLong(0) === 10L)
    assert(gate(0).getInt(1) === 1, "aggregate PQ recall below 0.9")
  }

  test("IVF-PQ index: partition-pruned + column-pruned ADC scan, " +
    "recall >= 0.9 vs brute force") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-idx").toString + "/index"
    Quantize.buildIvfPqIndex(spark, sf, idx)
    val topk = Quantize.ivfPqTopK(spark, idx, nprobe = 4)
    // plan: the ADC scan touches only probed cell dirs, and its
    // ReadSchema must NOT include the raw vector column (codes only)
    val physical = topk.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = physical.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
    }
    assert(scans.nonEmpty, "no partition-pruned scan found")
    scans.foreach(s => assert(s.selectedPartitions.partitionCount < 16,
      s"probe scanned ${s.selectedPartitions.partitionCount}/16 cells"))
    val adcScan = scans.find(_.schema.fieldNames.contains("codes"))
    assert(adcScan.isDefined, "no codes-column ADC scan found")
    assert(!adcScan.get.schema.fieldNames.contains("vec"),
      s"ADC scan reads the raw vectors: ${adcScan.get.schema.fieldNames.toSeq}")
    // recall: both approximation axes together (missed cells + PQ
    // candidates) still clear the 0.9 aggregate band
    val exact = Similarity.bruteForceTopK(spark, sf, numQueries = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = topk.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF-PQ recall $recall too low")
    spark.catalog.clearCache()
  }

  test("ADC ordering is meaningful before rerank: PQ top-k without " +
    "rerank headroom still overlaps the true top-k") {
    val exact = Similarity.bruteForceTopK(spark, sf, numQueries = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcOnly = Quantize.pqTopK(spark, sf, numQueries = 5, k = 10,
      rerank = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(adcOnly).size.toDouble / exact.size
    assert(recall >= 0.5, s"raw ADC recall $recall suspiciously low — " +
      "codebooks or LUT scoring are broken")
  }
}
