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
    "no unpruned index read anywhere, recall >= 0.9 vs brute force") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-idx").toString + "/index"
    Quantize.buildIvfPqIndex(spark, sf, idx)
    val queries = Similarity.normalized(spark, sf)
      .where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val topk = Quantize.ivfPqTopK(spark, idx, queries, nprobe = 4)
    // the exact probed-cell set, recomputed from the persisted
    // centroids: per query, its nprobe best cells by dot product —
    // the pruning bound is data-dependent (10 queries x nprobe can
    // legitimately cover every cell), so assert against THIS, not a
    // hard cell-count literal
    val cents = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val probed = queries.collect().flatMap { r =>
      val q = r.getSeq[Double](1).toArray
      cents.map { case (cid, c) =>
        (c.zip(q).map { case (a, b) => a * b }.sum, cid)
      }.sortBy { case (sim, cid) => (-sim, cid) }.take(4).map(_._2)
    }.toSet
    // plan: the ADC scan touches only probed cell dirs, and its
    // ReadSchema must NOT include the raw vector column (codes only)
    val physical = topk.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val allScans = physical.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // the query-fetch fix: EVERY scan of the index data dir must be
    // partition-pruned — a predicate-on-vec_id fetch would show up
    // here as an unpruned full-index scan
    val indexScans = allScans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("/index/data")))
    assert(indexScans.nonEmpty, "no index data scan found")
    indexScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        s"unpruned index scan (reads all cells): ${s.nodeName}")
      assert(s.selectedPartitions.partitionCount <= probed.size,
        s"probe scanned ${s.selectedPartitions.partitionCount} cells, " +
          s"only ${probed.size} were probe-selected")
    }
    val adcScan = indexScans.find(_.schema.fieldNames.contains("codes"))
    assert(adcScan.isDefined, "no codes-column ADC scan found")
    assert(!adcScan.get.schema.fieldNames.contains("vec"),
      s"ADC scan reads the raw vectors: ${adcScan.get.schema.fieldNames.toSeq}")
    // pruning must be REAL here, not vacuous: nprobe=4 keeps the 10
    // queries' probe union under all 16 cells on the gate corpus
    assert(probed.size < 16,
      s"probe union covers all cells — pruning assertion is vacuous")
    // sanity recall at nprobe=4: the deliberately-pruned probe still
    // finds a meaningful fraction of true neighbors (the ≥0.9 band is
    // gated at the DEFAULT nprobe in the ivfPqRecall test below —
    // near-random gate data scatters neighbors across cells, so a
    // 4/16 probe is a coverage test, not a recall gate)
    val exact = Similarity.bruteForceTopK(spark, sf, numQueries = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = topk.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ nprobe=4 recall $recall suspiciously " +
      "low — cell assignment or ADC scoring is broken")
    spark.catalog.clearCache()
  }

  test("ivfPqRecall driver row: 10 queries, 0.9 band met " +
    "(the q_ann_ivfpq_recall gate)") {
    val gate = Quantize.ivfPqRecall(spark, sf).collect()
    assert(gate.length === 1)
    assert(gate(0).getLong(0) === 10L)
    assert(gate(0).getInt(1) === 1, "IVF-PQ aggregate recall below 0.9")
  }

  test("ivfPqDriftRecall driver row: stale recall holds the 0.7 floor, " +
    "a fresh rebuild restores 0.9 and never regresses past the band " +
    "(the q_ann_ivfpq_drift gate)") {
    val gate = Quantize.ivfPqDriftRecall(spark, sf).collect()
    assert(gate.length === 1)
    assert(gate(0).getLong(0) === 10L)
    assert(gate(0).getInt(1) === 1, "stale-index recall fell below 0.7 " +
      "after 4 drifted appends — frozen structure degraded faster than " +
      "the documented cadence")
    assert(gate(0).getInt(2) === 1, "fresh rebuild on the drifted corpus " +
      "did not restore the 0.9 band — the decay is not staleness")
    assert(gate(0).getInt(3) === 1, "rebuild regressed recall by more " +
      "than 0.1 vs stale — rebuilding on cadence would be unsafe")
  }

  test("driftedBatch is deterministic, norm-preserving, and id-disjoint " +
    "from its base") {
    val base = Similarity.normalized(spark, sf).select("vec_id", "vec")
      .limit(50).localCheckpoint()
    val b2a = Quantize.driftedBatch(base, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toMap
    val b2b = Quantize.driftedBatch(base, 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toMap
    assert(b2a === b2b) // no RNG anywhere
    // unit norm after the shift-and-renormalize
    b2a.values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9) }
    // ids offset by b·idStride — appended batches never collide
    val baseIds = base.collect().map(_.getLong(0)).toSet
    assert(b2a.keySet.intersect(baseIds).isEmpty)
  }

  test("incremental IVF-PQ append: frozen-structure appends keep the " +
    "index complete, correctly encoded, and above the recall band") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-append").toString + "/index"
    val history = corpus.where(col("vec_id") < 250)
    // index structure (centroids + codebooks) trains on history only
    Quantize.buildIvfPqIndexFor(history, idx)
    // arrivals in two batches, as a foreachBatch ingest would deliver
    Quantize.appendToIvfPqIndex(spark, idx,
      corpus.where(col("vec_id") >= 250 && col("vec_id") < 375))
    Quantize.appendToIvfPqIndex(spark, idx,
      corpus.where(col("vec_id") >= 375))
    val data = spark.read.parquet(s"$idx/data")
    // complete: every corpus vector present exactly once
    assert(data.count() === corpus.count())
    assert(data.select("vec_id").distinct().count() === corpus.count())
    // appended codes are EXACTLY what the frozen codebooks encode —
    // append-time encoding matches an offline re-encode
    val packed = Quantize.packBooks(
      spark.read.parquet(s"$idx/codebooks")).localCheckpoint()
    val reEncoded = Quantize.pqEncode(
      corpus.where(col("vec_id") >= 250), packed)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    val stored = data.where(col("vec_id") >= 250)
      .select("vec_id", "codes")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).toMap
    assert(stored === reEncoded)
    // appended rows live in their frozen nearest cell: spot-check via
    // the persisted centroids
    val cents = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val cellOf = data.where(col("vec_id") >= 250)
      .select("vec_id", "cell", "vec")
      .collect().map { r =>
        val v = r.getSeq[Double](2).toArray
        val best = cents.map { case (cid, c) =>
          (c.zip(v).map { case (a, b) => a * b }.sum, cid)
        }.maxBy { case (sim, cid) => (sim, -cid) }._2
        (r.getInt(1), best)
      }
    cellOf.foreach { case (stored, expected) =>
      assert(stored === expected, "appended row not in its nearest cell")
    }
    // the probe over the half-trained, twice-appended index still
    // clears the recall band at the default nprobe
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val got = Quantize.ivfPqTopK(spark, idx, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(spark, sf, numQueries = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.9, s"appended-index recall $recall below band")
  }

  test("IVF-PQ delete: tombstoned vectors never surface, the delete " +
    "is idempotent, and compaction folds tombstones physically with " +
    "bit-identical probes") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-delete").toString + "/index"
    Quantize.buildIvfPqIndexFor(corpus, idx)
    val queries = corpus.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    // delete the vectors the undeleted probe actually RETURNS — the
    // strongest form of the guarantee: yesterday's answers must be
    // un-returnable today
    val victims = Quantize.ivfPqTopK(spark, idx, queries)
      .select("neighbor_id").distinct()
      .limit(20).collect().map(_.getLong(0)).toSet
    Quantize.deleteFromIvfPqIndex(spark, idx,
      corpus.where(col("vec_id").isin(victims.toSeq: _*))
        .select("vec_id"))
    def probe() = Quantize.ivfPqTopK(spark, idx, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3)).toSeq
    val afterDelete = probe()
    assert(afterDelete.nonEmpty)
    victims.foreach { v =>
      assert(!afterDelete.exists(_._2 == v),
        s"tombstoned vector $v still returned by the probe")
    }
    // idempotent by semantics: re-delivering the same delete (plus
    // unknown ids) changes nothing
    Quantize.deleteFromIvfPqIndex(spark, idx,
      corpus.where(col("vec_id").isin(victims.toSeq: _*))
        .select("vec_id")
        .union(spark.range(900000, 900005).select(col("id").as("vec_id"))))
    assert(probe() === afterDelete, "re-applied delete changed the probe")
    // compaction folds: data physically lacks the victims, the
    // tombstone table is gone, probes are bit-identical
    Quantize.compactIvfPqIndex(spark, idx)
    assert(probe() === afterDelete, "compaction changed probe results")
    val remaining = spark.read.parquet(s"$idx/data")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(victims.intersect(remaining).isEmpty,
      "compaction left tombstoned rows in the data table")
    assert(remaining.size.toLong === corpus.count() - victims.size)
    assert(!new java.io.File(s"$idx/deletes").exists(),
      "compaction left the tombstone table behind")
    // interrupted swap detected loudly
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$idx/data.old"))
    val e = intercept[IllegalArgumentException] {
      Quantize.compactIvfPqIndex(spark, idx)
    }
    assert(e.getMessage.contains("interrupted"))
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
