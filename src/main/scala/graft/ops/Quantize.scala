package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) — the memory-bounded ANN family that
  * complements the IVF cell layout in [[Similarity]]. Extension beyond
  * the reference surface (SURVEY §7 step 7, similarity-search scale
  * path).
  *
  * IVF prunes WHICH vectors a query scans; PQ shrinks WHAT each scan
  * touches. A vector is split into `m` subvectors and each subvector
  * is replaced by the id of its nearest per-subspace centroid
  * ("code"), so a 64-dim float64 vector (512 B) becomes `m` small ints
  * (8 B at m=8/ksub=256): at 10⁹ vectors the code table is ~8 GB —
  * executor-memory-resident — while the raw vectors (512 GB) are only
  * ever read once to encode and once more to rerank a few candidates.
  * This is the standard IVF-PQ decomposition (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
  * `IndexIVFPQ` shape).
  *
  * Spark mapping — everything rides the same discipline as the IVF
  * path:
  *  - codebooks are DATA in one broadcast row (array of m × ksub
  *    centroid structs), never plan literals (k·dim literal
  *    expressions blow the codegen method limit — the
  *    [[Similarity.ivfCentroidsDf]] lesson);
  *  - encode is one `crossJoin(broadcast(onerow))` + per-row array
  *    expressions over the codegen'd [[graft.functions.DotProduct]]:
  *    zero shuffle, scan-speed;
  *  - asymmetric-distance (ADC) scoring precomputes each query's
  *    m × ksub lookup table ONCE, then scores a candidate as m
  *    indexed loads through the codegen'd
  *    [[graft.functions.AdcScore]] expression (the equivalent
  *    aggregate/zip_with/element_at composition runs interpreted —
  *    this is the per-(query, candidate) hot loop) — no
  *    per-candidate dot products at all;
  *  - ADC is a candidate generator, not an oracle: the top
  *    k·`rerank` ADC candidates re-attach their true vectors and an
  *    exact cosine pass picks the final top-k (FAISS "refine"),
  *    which is what makes the recall gate tight.
  *
  * Correctness: float k-means is not bit-portable across engines, so
  * the driver gate is the same thresholded-aggregate trick as
  * [[Similarity.ivfRecall]] — ONE hash-oracle-able row asserting
  * aggregate recall vs the brute-force twin (itself hash-proven vs
  * DuckDB); per-query floors and encode determinism are asserted in
  * QuantizeSpec.
  */
object Quantize {

  /** Subvector slices of a (vec_id, vec) frame: one row per (vec_id,
    * sub, svec), sub ∈ [0, m). Pure per-row fan-out, no shuffle. */
  private def subvectors(vectors: DataFrame, m: Int): DataFrame = {
    val dsub = expr(s"size(vec) DIV $m")
    vectors
      // loud, not truncated: m ∤ dim would silently leave the trailing
      // dim % m dimensions out of codebooks, codes AND query LUTs —
      // ADC quality quietly below what the parameters imply. The
      // assert rides the row (codegen'd, no extra pass); isNull keeps
      // the select's type = vec's
      .withColumn("vec", when(
        assert_true(expr(s"size(vec) % $m = 0"),
          lit(s"PQ subvector count m=$m must divide the vector " +
            "dimension — trailing dims would silently drop from " +
            "codebooks, codes and LUTs")).isNull,
        col("vec")))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("vec"), j * dsub + 1, dsub))))
      .select(col("vec_id"), col("pos").as("sub"), col("col").as("svec"))
  }

  /** Per-subspace codebooks: for each of the `m` subspaces, `ksub`
    * centroids seeded from a seeded-hash sample (deterministic,
    * id-distribution-independent) and
    * refined by one Lloyd step (plain means — PQ centroids live in the
    * subspace, they are NOT renormalized). Output one row per (sub,
    * code) with the centroid and its precomputed half squared norm:
    * argmin_c ‖x−c‖² ≡ argmax_c (x·c − ‖c‖²/2), so assignment later
    * costs one dot per candidate. All DataFrame compute; the result is
    * k = m·ksub tiny rows. */
  def pqCodebooks(vectors: DataFrame, m: Int = 8, ksub: Int = 16,
      trainSample: Int = 65536): DataFrame = {
    // codebooks are statistics, not indexes: train on a bounded sample
    // (the FAISS practice) — at 10⁹ vectors the Lloyd join below would
    // otherwise shuffle n·m subvector rows for a 128-row result. The
    // sample is the seeded-hash permutation (Similarity.hashSample):
    // deterministic like the old lowest-vec_id sample, but independent
    // of the id distribution — time-ordered ids no longer bias the
    // codebooks toward the oldest data. 64k vectors estimate m·ksub ≤
    // a few thousand subspace centroids with huge margin.
    val sample = Similarity.hashSample(vectors, trainSample, "pqtrain")
    val sub = subvectors(sample, m)
    // seeds: per subspace, the first ksub rows of a SECOND seeded-hash
    // permutation (bounded window) — same de-bias rationale as the
    // sample itself; vec_id tiebreak keeps the order total
    val seeds = sub
      .withColumn("rn", row_number().over(
        Window.partitionBy("sub").orderBy(
          md5(concat(lit("graft:pqseed:"), col("vec_id").cast("string"))),
          col("vec_id"))))
      .where(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).cast("int").as("code"),
        col("svec").as("cvec"))
    val assigned = assignCodes(sub, packBooks(seeds))
    // one Lloyd step: mean per (sub, code, pos); codes that captured
    // no vectors keep their seed (left join back)
    val refined = assigned.join(sub, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("svec")))
      .groupBy("sub", "code", "pos").agg(avg("col").as("mu"))
      .groupBy("sub", "code")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu"))))
        .as("pairs"))
      .select(col("sub"), col("code"),
        transform(col("pairs"), p => p.getField("mu")).as("cvec"))
    seeds.select("sub", "code")
      .join(refined, Seq("sub", "code"), "left")
      .join(seeds.select(col("sub"), col("code"),
        col("cvec").as("seed_cvec")), Seq("sub", "code"))
      .select(col("sub"), col("code"),
        coalesce(col("cvec"), col("seed_cvec")).as("cvec"))
  }

  /** The m × ksub codebook table as ONE broadcast-able row: `books` is
    * an array indexed by sub, each element the array of (code, cvec,
    * halfn = ‖cvec‖²/2) structs sorted by code. */
  def packBooks(codebooks: DataFrame): DataFrame =
    codebooks
      .select(col("sub"), struct(col("code"),
        col("cvec"), (dot(col("cvec"), col("cvec")) / 2).as("halfn"))
        .as("entry"))
      .groupBy("sub")
      .agg(array_sort(collect_list(col("entry"))).as("entries"))
      .agg(array_sort(collect_list(struct(col("sub"), col("entries"))))
        .as("pairs"))
      .select(transform(col("pairs"), p => p.getField("entries"))
        .as("books"))

  /** Nearest code per (vec_id, sub) row — used by the Lloyd step. */
  private def assignCodes(sub: DataFrame, packed: DataFrame): DataFrame =
    sub.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("sub"),
        (-array_max(transform(element_at(col("books"), col("sub") + 1),
          e => struct((dot(col("svec"), e.getField("cvec")) -
            e.getField("halfn")).as("s"),
            (-e.getField("code")).cast("double").as("nc"))))
          .getField("nc")).cast("int").as("code"))

  /** PQ-encode a (vec_id, vec) frame: (vec_id, codes array<int>) with
    * codes(j) = the j-th subspace's nearest centroid. One broadcast
    * row in, per-row array expressions out — zero shuffle, the plan
    * is a single projection over the scan (asserted in QuantizeSpec).
    * Ties break to the lowest code, so encoding is deterministic
    * given the codebooks. */
  def pqEncode(vectors: DataFrame, packed: DataFrame): DataFrame = {
    val m = size(col("books"))
    val dsub = expr("size(vec) DIV size(books)")
    vectors.crossJoin(broadcast(packed))
      .select(col("vec_id"),
        transform(sequence(lit(0), m - 1), j =>
          (-array_max(transform(element_at(col("books"), j + 1),
            e => struct((dot(slice(col("vec"), j * dsub + 1, dsub),
              e.getField("cvec")) - e.getField("halfn")).as("s"),
              (-e.getField("code")).cast("double").as("nc"))))
            .getField("nc")).cast("int")).as("codes"))
  }

  /** ADC top-k with exact rerank over the `embeddings` table: for each
    * of the first `numQueries` vectors, score every encoded vector by
    * the asymmetric distance ∑ⱼ lut[j][codes[j]] (lut[j][c] = qⱼ·c —
    * inner product against PRE-NORMALIZED corpus vectors approximates
    * cosine), keep the top k·`rerank` candidates, then rank those by
    * exact cosine on the true vectors. The heavy stream (corpus) only
    * ever carries (vec_id, codes): the scoring pass does m
    * `element_at` picks per row instead of a dim-wide dot, and true
    * vectors re-attach for the candidate set only (k·rerank·numQueries
    * rows).
    *
    * Defaults (m=16, ksub=32, rerank=20) are what meet the 0.9 recall
    * band on the near-random 64-dim gate corpus — the hard case for
    * PQ, which thrives on clustered data. As with the IVF nprobe note:
    * k·rerank = 200 of the gate corpus is an artifact of the tiny
    * gate SF; at real scale the candidate set is a fixed few hundred
    * rows out of 10⁹, and m/ksub grow to 8-bit codes (ksub=256). */
  def pqTopK(spark: SparkSession, dir: String, numQueries: Int = 10,
      k: Int = 10, m: Int = 16, ksub: Int = 32, rerank: Int = 20)
      : DataFrame =
    // q_ann_pq and q_ann_pq_recall both need this exact result; the
    // memo (Scratch discipline) keeps the m-fold codebook training +
    // full-corpus encode at once per (session, params) — the recall
    // gate measures recall, not a second identical build
    Scratch.memo(spark, s"pq:$dir:$numQueries:$k:$m:$ksub:$rerank") {
      pqTopKUncached(spark, dir, numQueries, k, m, ksub, rerank)
    }

  private def pqTopKUncached(spark: SparkSession, dir: String,
      numQueries: Int, k: Int, m: Int, ksub: Int, rerank: Int)
      : DataFrame = {
    val corpus = Similarity.normalized(spark, dir)
      .select("vec_id", "vec").localCheckpoint()
    val packed = packBooks(pqCodebooks(corpus, m, ksub)).localCheckpoint()
    val codes = pqEncode(corpus, packed)
    val dsub = expr("size(qvec) DIV size(books)")
    // per-query lookup table: lut[j][c+1] = q_j · cvec(j, c)
    val queries = corpus.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
      .crossJoin(broadcast(packed))
      .select(col("query_id"), col("qvec"),
        transform(col("books"), (entries, j) =>
          transform(entries, e => dot(
            slice(col("qvec"), j * dsub + 1, dsub), e.getField("cvec"))))
          .as("lut"))
    // the ADC stream through the n×numQueries window shuffle carries
    // ONLY (query_id, neighbor_id, adc) — the dim-wide qvec would
    // otherwise ride every candidate row through the exchange (the
    // module's own discipline; ivfPqTopK already does it this way)
    val adc = codes.join(broadcast(queries.select("query_id", "lut")),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcScore(col("codes"), col("lut")).as("adc"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cand = adc.withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= k * rerank)
      .select("query_id", "neighbor_id")
    // exact rerank of the candidate set only; the query vectors
    // re-attach HERE (broadcast, k·rerank·numQueries rows)
    val exact = cand.join(
      corpus.select(col("vec_id").as("neighbor_id"), col("vec")),
      "neighbor_id")
      .join(broadcast(queries.select("query_id", "qvec")), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        dot(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Per-query hit counts of [[pqTopK]] vs the TRUE top-k (the
    * brute-force twin) — the spec-level recall instrument, same shape
    * as [[Similarity.ivfRecallPerQuery]]. */
  def pqRecallPerQuery(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, m: Int = 16, ksub: Int = 32,
      rerank: Int = 20): DataFrame = {
    val pq = pqTopK(spark, dir, numQueries, k, m, ksub, rerank)
      .select("query_id", "neighbor_id")
    val brute = Similarity.bruteForceTopK(spark, dir, numQueries, k)
      .select("query_id", "neighbor_id")
    val hits = pq.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
  }

  /** Driver-gate recall row for [[pqTopK]]: ONE aggregate row
    * asserting the PQ+rerank path recovers ≥ 90% of all true top-k
    * neighbors — hash-oracle-able for the same reason as
    * [[Similarity.ivfRecall]] (DuckDB cannot re-run PQ, but it can
    * state the invariant, so the hash compare becomes a hard recall
    * assertion). Deterministic given a fixed partitioning: seeds and
    * argmins are seeded/tie-broken, but the Lloyd step's distributed
    * avg() over doubles is not bit-stable across partition layouts
    * (the ivfCentroids caveat) — in principle a near-boundary ADC
    * ordering could differ between cluster sizes; the ≥0.9 band has
    * ample margin over that last-ulp noise. */
  def pqRecall(spark: SparkSession, dir: String, numQueries: Int = 10,
      k: Int = 10, m: Int = 16, ksub: Int = 32, rerank: Int = 20)
      : DataFrame =
    pqRecallPerQuery(spark, dir, numQueries, k, m, ksub, rerank)
      .agg(count(lit(1)).as("n_queries"),
        (sum("n_hits") >= math.ceil(0.9 * k * numQueries).toLong)
          .cast("int").as("recall_ge_90"))

  val pqRecallSql: String =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
      |       1 AS recall_ge_90
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  // ----- IVF-PQ: the composed 100 TB index layout -----

  /** Build a persisted IVF-PQ index — the composition of both index
    * families and the actual ≥10⁹-vector layout (FAISS `IndexIVFPQ`):
    * rows live in their IVF cell's DIRECTORY (partition pruning skips
    * unprobed cells entirely) and carry their PQ codes NEXT TO the raw
    * vector, so the ADC scoring scan reads only the narrow `codes`
    * column (columnar pruning skips the wide `vec` bytes within the
    * probed cells) and the raw vectors are touched just for the final
    * candidate rerank. Both prunings are plan-asserted in
    * QuantizeSpec.
    *
    * Layout under `indexPath`: `data/cell=N/` (vec_id, codes, vec),
    * plus `centroids` and `codebooks` sidecar tables — everything a
    * fresh session needs to probe. */
  def buildIvfPqIndex(spark: SparkSession, dir: String, indexPath: String,
      cells: Int = 16, m: Int = 16, ksub: Int = 32,
      twoLevelFrom: Int = 512): Unit =
    buildIvfPqIndexFor(Similarity.normalized(spark, dir)
      .select("vec_id", "vec"), indexPath, cells, m, ksub, twoLevelFrom)

  /** [[buildIvfPqIndex]] over any (vec_id, vec) frame of unit vectors
    * — the form the incremental path uses (build on the history,
    * [[appendToIvfPqIndex]] the arrivals). */
  def buildIvfPqIndexFor(vectors: DataFrame, indexPath: String,
      cells: Int = 16, m: Int = 16, ksub: Int = 32,
      twoLevelFrom: Int = 512): Unit = {
    val corpus = vectors.localCheckpoint()
    val cents = Similarity.ivfCentroidsDf(corpus, cells).localCheckpoint()
    val books = pqCodebooks(corpus, m, ksub).localCheckpoint()
    // past ~512 cells the single-level n·k assignment dominates the
    // build; switch to the two-level probe (the semanticDedupClusters
    // threshold — measured 5.8× at k=1788/200k vectors, see SCALE.md)
    val assign = if (cells >= twoLevelFrom)
      Similarity.assignCellsTwoLevel(corpus, cents)
    else Similarity.assignCells(corpus, cents)
    corpus
      .join(assign, "vec_id")
      .join(pqEncode(corpus, packBooks(books)), "vec_id")
      // cell-align BEFORE partitionBy — without it every scan task
      // writes its own file per cell (tasks × cells small files; the
      // appendToIvfPqIndex/compact paths already apply this)
      .repartition(col("cell"))
      .select(col("vec_id"), col("codes"), col("vec"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/data")
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
    books.write.mode("overwrite").parquet(s"$indexPath/codebooks")
  }

  /** Append new vectors to a persisted IVF-PQ index WITHOUT
    * retraining — the maintenance path that makes the flagship layout
    * a living index instead of a batch artifact (and the natural
    * `foreachBatch` body for a continuous embedding ingest): each
    * arrival is assigned to its frozen nearest cell and PQ-encoded
    * against the frozen codebooks, then lands in the cell
    * directories. This is the FAISS operational model: index
    * STRUCTURE (centroids, codebooks) trains once on history;
    * arrivals stream in forever; distribution drift is handled by a
    * periodic rebuild, not per-batch retraining (retraining per batch
    * would re-encode the whole index — O(n) per arrival).
    *
    * Scale shape: assignment and encode are broadcast-only map-side
    * projections over the batch (centroids as ONE array row, the
    * [[ivfPqTopK]] probe pattern; codebooks via [[pqEncode]]) — the
    * history is never read, and the only exchange is the
    * cell-aligning repartition of the BATCH so each append adds at
    * most one file per cell, not tasks × cells (the
    * [[graft.streaming.Ingest.appendToStore]] discipline). Probe cost
    * after an append is unchanged: the probe prunes by cell directory
    * and new files simply join their cell. */
  def appendToIvfPqIndex(spark: SparkSession, indexPath: String,
      newVectors: DataFrame): Unit = {
    val packed = packBooks(spark.read.parquet(s"$indexPath/codebooks"))
      .localCheckpoint()
    val centArr = spark.read.parquet(s"$indexPath/centroids")
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("cc"))
    val batch = newVectors.select("vec_id", "vec")
    val assigned = batch.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("vec"),
        (-array_max(transform(col("cc"),
          c => struct(dot(col("vec"), c.getField("cvec")).as("sim"),
            (-c.getField("cid")).cast("double").as("nc"))))
          .getField("nc")).cast("int").as("cell"))
    assigned
      .join(pqEncode(batch, packed), "vec_id")
      .repartition(col("cell"))
      .select(col("vec_id"), col("codes"), col("vec"), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexPath/data")
  }

  /** The tombstone table of a persisted IVF-PQ index — vec_id rows
    * under `deletes/` — or None when nothing was ever deleted (probes
    * skip the anti-join entirely). Hadoop FileSystem API so remote
    * index paths behave (the StreamIndex lesson). */
  private def ivfPqDeletes(spark: SparkSession,
      indexPath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/deletes")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Delete vectors from a persisted IVF-PQ index WITHOUT rewriting
    * cells — the takedown path that completes the lifecycle (build →
    * append → DELETE → compact), mirroring
    * [[graft.ops.Terms.deleteFromBm25Index]]: the corpus-sized data
    * table is untouched; the batch appends its ids to a tombstone
    * table and every probe anti-joins its PROBED rows against the
    * tombstone set — cost proportional to probed-cell occupancy,
    * never the index. Unlike BM25 there are no corpus statistics to
    * adjust (scoring is per-pair), so deletes here are idempotent by
    * SEMANTICS alone: duplicate tombstones, re-delivered batches and
    * deletes of unknown ids all resolve to the same anti-join set.
    * [[compactIvfPqIndex]] folds tombstones into the physical layout
    * and clears them. */
  def deleteFromIvfPqIndex(spark: SparkSession, indexPath: String,
      ids: DataFrame): Unit =
    ids.select("vec_id").coalesce(1)
      .write.mode("append").parquet(s"$indexPath/deletes")

  /** Compact a persisted IVF-PQ index: fold every cell back to one
    * file (streamed [[appendToIvfPqIndex]] batches add a file per
    * cell per batch — the probe prunes the same either way, but file
    * COUNT is task/open/footer overhead) and fold tombstones into the
    * physical layout ([[deleteFromIvfPqIndex]] rows are dropped from
    * their cells, then the tombstone table is cleared). Durable
    * two-rename swap with loud interrupted-swap detection (the
    * [[graft.ops.Terms.compactBm25Index]] discipline). Crash ordering
    * is safe: the tombstone clear runs LAST, so a crash after the
    * data swap leaves redundant tombstones that probes anti-join
    * against rows that no longer exist — a no-op. Centroids and
    * codebooks are untouched: compaction never retrains. */
  def compactIvfPqIndex(spark: SparkSession, indexPath: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val data = new org.apache.hadoop.fs.Path(s"$indexPath/data")
    val fs = data.getFileSystem(conf)
    val qual = fs.makeQualified(data)
    val tmp = new org.apache.hadoop.fs.Path(
      qual.getParent, qual.getName + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(
      qual.getParent, qual.getName + ".old")
    require(!fs.exists(old),
      s"compactIvfPqIndex: $old exists — a previous compaction swap was " +
        "interrupted; recover (restore or delete the .old copy) by hand")
    fs.delete(tmp, true)
    val folded = ivfPqDeletes(spark, indexPath) match {
      case Some(t) => spark.read.parquet(qual.toString)
        .join(t.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      case None => spark.read.parquet(qual.toString)
    }
    folded.repartition(col("cell"))
      .select(col("vec_id"), col("codes"), col("vec"), col("cell"))
      .write.partitionBy("cell").parquet(tmp.toString)
    require(fs.rename(qual, old),
      s"compactIvfPqIndex: failed to move $qual aside")
    require(fs.rename(tmp, qual),
      s"compactIvfPqIndex: failed to move compacted data into place")
    fs.delete(old, true)
    val del = new org.apache.hadoop.fs.Path(s"$indexPath/deletes")
    fs.delete(del, true)
  }

  /** Query a persisted IVF-PQ index: probe each query's `nprobe` best
    * cells (centroids ride in as ONE broadcast array row — map-side
    * probe, no plan literals), ADC-score ONLY the probed cells' `codes`
    * column via per-query lookup tables, keep the top k·`rerank`
    * candidates, then exactly rerank those against their true vectors
    * (read from the same probed partitions). Scan cost per query is
    * nprobe/cells of the CODES bytes plus candidates·dim of vector
    * bytes — at 10⁹ vectors with cells = √n that is megabytes, not
    * terabytes.
    *
    * `queriesIn` is a SIDE INPUT — (query_id, qvec) with qvec unit-
    * normalized like the indexed vectors. Fetching queries from the
    * index itself (`data.where(vec_id < n)`) would defeat the probe's
    * partition pruning for the fetch step: the predicate is on a
    * DATA column, so finding 10 query rows reads every cell directory
    * — a full-index scan at 10⁹ vectors. Callers take queries from
    * the embeddings table (or any external frame) instead; the index
    * is only ever read cell-pruned (asserted in QuantizeSpec). */
  def ivfPqTopK(spark: SparkSession, indexPath: String,
      queriesIn: DataFrame, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    val data = spark.read.parquet(s"$indexPath/data")
    val packed = packBooks(spark.read.parquet(s"$indexPath/codebooks"))
      .localCheckpoint()
    val centArr = spark.read.parquet(s"$indexPath/centroids")
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("cc"))
      .localCheckpoint()
    // nprobe = 0 → auto-tune against THIS index's cell count (the
    // sidecar is one tiny row, already checkpointed above) — see
    // [[Similarity.nprobeAuto]]: a fixed budget quietly loses recall
    // as indexes are provisioned with more cells
    val np = if (nprobe > 0) nprobe
      else Similarity.nprobeAuto(
        centArr.select(size(col("cc"))).head().getInt(0))
    val dsub = expr("size(qvec) DIV size(books)")
    // per-query probe cells + ADC lookup table, one row per
    // (query, probed cell); bounded numQueries × nprobe
    val queries = queriesIn
      .select(col("query_id"), col("qvec"))
      .crossJoin(broadcast(centArr)).crossJoin(broadcast(packed))
      .select(col("query_id"), col("qvec"),
        transform(col("books"), (entries, j) =>
          transform(entries, e => dot(
            slice(col("qvec"), j * dsub + 1, dsub), e.getField("cvec"))))
          .as("lut"),
        explode(slice(reverse(array_sort(transform(col("cc"),
          c => struct(dot(col("qvec"), c.getField("cvec")).as("sim"),
            c.getField("cid").as("cid"))))), 1, np)
          .getField("cid")).as("cell"))
      .localCheckpoint()
    // static IN-list on the partition column → directory-level pruning
    // (the ivfTopKIndexed pattern); bounded by numQueries × nprobe
    val probeCells = queries.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val prunedRaw = graft.core.Tables.packedScan(
      data.where(col("cell").isin(probeCells: _*)), s"$indexPath/data")
    // tombstoned vectors drop out of BOTH the ADC pass and the rerank
    // here: the anti-join touches only the probed cells' rows, so a
    // delete-free index pays nothing (None → no join in the plan) and
    // a deleted one pays probed-occupancy, never index size
    val pruned = ivfPqDeletes(spark, indexPath) match {
      case Some(t) => prunedRaw.join(
        t.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      case None => prunedRaw
    }
    val adc = pruned.select(col("cell"), col("vec_id"), col("codes"))
      .join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcScore(col("codes"), col("lut")).as("adc"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    val cand = adc.withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= k * rerank)
      .select("query_id", "neighbor_id")
    // exact rerank: true vectors re-read from the probed partitions
    // only; query vectors come from the side input, never the index
    val exact = cand
      .join(pruned.select(col("vec_id").as("neighbor_id"), col("vec")),
        "neighbor_id")
      .join(broadcast(queriesIn.select(col("query_id"), col("qvec"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        dot(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Gate-query side input for the IVF-PQ probe: the first
    * `numQueries` embeddings, unit-normalized exactly like the
    * indexed vectors — read from the EMBEDDINGS table, so the index
    * itself is only ever touched cell-pruned. */
  private def gateQueries(spark: SparkSession, dir: String,
      numQueries: Int): DataFrame =
    Similarity.normalized(spark, dir).where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))

  /** Build-and-probe form of the persisted IVF-PQ index for the
    * driver gate (`q_ann_ivfpq`): builds the full index layout under
    * a scratch directory, then answers top-k through the pruned probe
    * — the whole flagship ≥10⁹-vector path exercised end to end in
    * one registered query. The scratch build is the honest cost: the
    * driver (and the bench) time index construction + probe, not a
    * pre-warmed read. */
  def ivfPqTopKQuery(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    // one scratch build per (session, SF): q_ann_ivfpq and its recall
    // twin probe the SAME index — the build cost stays in the bench
    // exactly once, and /tmp holds one copy, removed at JVM exit
    val idx = Scratch.cached(spark, s"ivfpq-gate:$dir", "graft-ivfpq-gate") {
      p => buildIvfPqIndex(spark, dir, p) }
    // the recall twin re-asks for the identical probe result: memoize
    // it (bounded: queries×k rows) so the pair pays one probe
    Scratch.memo(spark, s"ivfpq-probe:$dir:$numQueries:$k:$nprobe:$rerank") {
      ivfPqTopK(spark, idx, gateQueries(spark, dir, numQueries),
        k, nprobe, rerank)
    }
  }

  /** Build-append-probe form for the driver gate (`q_ann_ivfpq_incr`):
    * index STRUCTURE (centroids, codebooks) trains on half the
    * corpus (even vec_ids), the other half arrives through
    * [[appendToIvfPqIndex]] — frozen-structure assignment + encode,
    * history untouched — and the probe answers over the union. The
    * recall twin gates the result against the TRUE top-k, so the
    * maintenance path has a driver-checked correctness row instead of
    * only a spec. */
  def ivfPqIncrTopKQuery(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    val idx = Scratch.cached(spark, s"ivfpq-incr:$dir", "graft-ivfpq-incr") {
      p =>
        val vecs = Similarity.normalized(spark, dir).select("vec_id", "vec")
        buildIvfPqIndexFor(vecs.where(col("vec_id") % 2 === 0), p)
        appendToIvfPqIndex(spark, p, vecs.where(col("vec_id") % 2 === 1))
    }
    Scratch.memo(spark,
        s"ivfpq-incr-probe:$dir:$numQueries:$k:$nprobe:$rerank") {
      ivfPqTopK(spark, idx, gateQueries(spark, dir, numQueries),
        k, nprobe, rerank)
    }
  }

  /** Driver-gate recall row for the INCREMENTAL index path
    * (`q_ann_ivfpq_incr_recall`): the [[ivfPqRecall]] thresholded
    * aggregate over [[ivfPqIncrTopKQuery]] — hash-exact against the
    * same constant oracle, turning "append then probe still finds the
    * true neighbors" into a hard driver assertion. */
  def ivfPqIncrRecall(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    val got = ivfPqIncrTopKQuery(spark, dir, numQueries, k, nprobe, rerank)
      .select("query_id", "neighbor_id")
    val brute = Similarity.bruteForceTopK(spark, dir, numQueries, k)
      .select("query_id", "neighbor_id")
    val hits = got.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .agg(count(lit(1)).as("n_queries"),
        (sum("n_hits") >= math.ceil(0.9 * k * numQueries).toLong)
          .cast("int").as("recall_ge_90"))
  }

  /** Per-query hit counts of the persisted-index probe vs the TRUE
    * top-k — the [[pqRecallPerQuery]] instrument pointed at the
    * composed IVF-PQ layout (both approximation axes at once: missed
    * cells AND quantized scoring). */
  def ivfPqRecallPerQuery(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    val got = ivfPqTopKQuery(spark, dir, numQueries, k, nprobe, rerank)
      .select("query_id", "neighbor_id")
    val brute = Similarity.bruteForceTopK(spark, dir, numQueries, k)
      .select("query_id", "neighbor_id")
    val hits = got.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
  }

  /** Driver-gate recall row for the persisted IVF-PQ index
    * (`q_ann_ivfpq_recall`): ONE aggregate row asserting the pruned
    * probe recovers ≥ 90% of all true top-k neighbors — the same
    * thresholded-aggregate trick as [[pqRecall]], so the driver's
    * hash compare is a hard recall assertion over the flagship index
    * layout. Same determinism caveat as [[pqRecall]]. */
  def ivfPqRecall(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame =
    ivfPqRecallPerQuery(spark, dir, numQueries, k, nprobe, rerank)
      .agg(count(lit(1)).as("n_queries"),
        (sum("n_hits") >= math.ceil(0.9 * k * numQueries).toLong)
          .cast("int").as("recall_ge_90"))

  val ivfPqRecallSql: String = pqRecallSql

  /** Driver-gate row for the DELETE path (`q_ann_ivfpq_deleted`):
    * builds the full index, tombstones every third vector through
    * [[deleteFromIvfPqIndex]], probes, and asserts BOTH delete
    * guarantees in one aggregate row — zero tombstoned ids among the
    * returned neighbors (`deleted_hits`), and ≥ 90% recall of the
    * true top-k over the SURVIVING corpus
    * ([[Similarity.bruteForceTopKFor]] with the deleted vectors
    * excluded from ground truth: a tombstoned vector is not a valid
    * neighbor, so truth must not contain it either). Hash-exact vs a
    * constant oracle, the [[ivfPqRecall]] trick. */
  def ivfPqDeletedRecall(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, nprobe: Int = 0,
      rerank: Int = 20): DataFrame = {
    // The tombstone write is the only difference from the shared gate
    // index ([[ivfPqTopKQuery]]'s Scratch key), and deletes never touch
    // data files — so this gate COPIES that index and tombstones the
    // copy instead of re-running the whole k-means + PQ train + write
    // (was a second full build, the most expensive row of the sf0.1
    // bench). The copy keeps isolation: other gates keep probing the
    // un-tombstoned original.
    val idx = Scratch.cached(spark, s"ivfpq-del:$dir", "graft-ivfpq-del") {
      p =>
        val shared = Scratch.cached(spark, s"ivfpq-gate:$dir",
          "graft-ivfpq-gate") { sp => buildIvfPqIndex(spark, dir, sp) }
        val conf = spark.sessionState.newHadoopConf()
        val src = new org.apache.hadoop.fs.Path(shared)
        val dst = new org.apache.hadoop.fs.Path(p)
        val fs = src.getFileSystem(conf)
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
        deleteFromIvfPqIndex(spark, p,
          Similarity.normalized(spark, dir).select("vec_id")
            .where(col("vec_id") % 3 === 0))
    }
    val got = ivfPqTopK(spark, idx, gateQueries(spark, dir, numQueries),
        k, nprobe, rerank)
      .select("query_id", "neighbor_id").localCheckpoint()
    val brute = Similarity.bruteForceTopKFor(
      Similarity.normalized(spark, dir).where(col("vec_id") % 3 =!= 0),
      gateQueries(spark, dir, numQueries), k)
      .select("query_id", "neighbor_id")
    val hits = got.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .agg(count(lit(1)).as("n_queries"),
        (sum("n_hits") >= math.ceil(0.9 * k * numQueries).toLong)
          .cast("int").as("recall_ge_90"))
      .crossJoin(got.agg(coalesce(
        sum((col("neighbor_id") % 3 === 0).cast("long")), lit(0L))
        .as("deleted_hits")))
  }

  val ivfPqDeletedRecallSql: String =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
      |       1 AS recall_ge_90, CAST(0 AS BIGINT) AS deleted_hits
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  // ----- index drift: frozen structure vs shifted arrivals -----

  /** Deterministic distribution-shifted batch `b` of a (vec_id, vec)
    * unit-vector corpus: every vector is pulled toward the fixed
    * global direction u = (1,…,1)/√dim with strength `b·alpha` and
    * re-normalized; ids offset by `b·idStride` so appended batches
    * never collide with history. Models real embedding drift (a
    * re-tuned encoder, a new domain crowding one region of the
    * sphere) with NO RNG — batch b is bit-identical every run and
    * successive batches move monotonically further from the
    * distribution the index structure trained on. At b·alpha = 0.6
    * the batch population's pairwise cosine floor is ~0.26 (s²/(1+s²))
    * — a dense cluster the frozen cells never planned for. */
  def driftedBatch(base: DataFrame, b: Int, alpha: Double = 0.15,
      idStride: Long = 1000000L): DataFrame = {
    val s = b * alpha
    // the no-collision claim is a PRECONDITION, enforced per-row
    // (codegen'd, no extra pass): a base corpus with ids ≥ idStride
    // would silently alias appended ids onto history ids and corrupt
    // ground truth, self-exclusion and hit counts downstream
    base.select(when(
      assert_true(col("vec_id") >= 0 && col("vec_id") < idStride,
        lit(s"driftedBatch: base vec_id must sit in [0, $idStride) " +
          "(idStride) or appended batch ids collide with history — " +
          "raise idStride for larger corpora")).isNull,
      col("vec_id") + lit(b.toLong * idStride)).as("vec_id"),
      normalize(transform(col("vec"),
        x => x + lit(s) / sqrt(size(col("vec")).cast("double"))))
        .as("vec"))
  }

  /** Recall hit-counts of a STALE index (structure frozen on the base
    * corpus, `batches` drifted batches appended via
    * [[appendToIvfPqIndex]]) vs a FRESH rebuild on the same full
    * corpus, probed with `numQueries` queries drawn from the MOST
    * drifted batch — the regime where frozen centroids/codebooks are
    * most wrong. Returns (stale_hits, fresh_hits, n_true): the
    * measurement behind [[ivfPqDriftRecall]] and the StressDrift
    * cadence curve. Ground truth is the exact brute-force top-k over
    * the full corpus. */
  def ivfPqDriftCounts(spark: SparkSession, base: DataFrame,
      scratchTag: String, batches: Int, alpha: Double = 0.15,
      numQueries: Int = 10, k: Int = 10, cells: Int = 16,
      nprobe: Int = 0, rerank: Int = 20): (Long, Long, Long) = {
    val batchFrames = (1 to batches).map(b => driftedBatch(base, b, alpha))
    val full = (base +: batchFrames).reduce(_ unionByName _)
      .localCheckpoint()
    // stale and fresh index builds are independent DAG chains over
    // already-checkpointed inputs; their probes likewise — overlap
    // them (guide §2.6, the Par discipline) so one chain's stragglers
    // back-fill with the other's tasks
    val (stale, fresh) = graft.core.Par.both(
      Scratch.cached(spark,
        s"ivfpq-drift-stale:$scratchTag:$batches:$alpha:$cells",
        "graft-ivfpq-drift") { p =>
        buildIvfPqIndexFor(base, p, cells)
        batchFrames.foreach(bf => appendToIvfPqIndex(spark, p, bf))
      },
      Scratch.cached(spark,
        s"ivfpq-drift-fresh:$scratchTag:$batches:$alpha:$cells",
        "graft-ivfpq-fresh") { p => buildIvfPqIndexFor(full, p, cells) })
    val queries = driftedBatch(base.where(col("vec_id") < numQueries),
        batches, alpha)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
      .localCheckpoint()
    val truth = Similarity.bruteForceTopKFor(full, queries, k)
      .select("query_id", "neighbor_id").localCheckpoint()
    def hitsOf(idx: String): Long =
      ivfPqTopK(spark, idx, queries, k, nprobe, rerank)
        .select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
    val (staleHits, freshHits) = graft.core.Par.both(
      hitsOf(stale), hitsOf(fresh))
    (staleHits, freshHits, truth.count())
  }

  /** Driver-gate row for index DRIFT (`q_ann_ivfpq_drift`) — the
    * verdict-r9 ask: the frozen-structure maintenance story
    * ("periodic rebuild") as a MEASURED gate instead of a doc
    * sentence. After `batches`=4 appends of progressively shifted
    * data (final shift 4·0.15 = 0.6 — the drifted population is a
    * dense cluster at pairwise-cos ≳ 0.26 that the frozen 16 cells
    * never trained on), asserts with the thresholded-aggregate trick:
    *  - `stale_recall_ge_70`: the stale index still recovers ≥ 70% of
    *    the true top-k for drifted queries (measured 0.72-0.78 at the
    *    gate SF),
    *  - `fresh_recall_ge_90`: a rebuild on the same corpus restores
    *    the standard ≥ 0.9 band — proving the decay is structure
    *    staleness, not data difficulty, and the periodic-rebuild
    *    policy actually repairs it,
    *  - `rebuild_no_regression`: the rebuild's recall is within 0.1
    *    of (or better than) stale — rebuilds are SAFE to apply on
    *    cadence. This was a strict `fresh > stale` until the round-10
    *    sf0.1 verify caught the gate failing its own measured story:
    *    under uniform-pull drift at fixed nprobe a rebuild does not
    *    universally win (the probe-budget effect the StressDrift
    *    curves quantify — re-balancing cells onto the dense drifted
    *    cluster can spread a query's lineage neighbors), so the
    *    strict form was scale-fragile by the engine's own SCALE.md
    *    account. The no-regression band is the claim that IS stable
    *    across SFs and drift levels.
    *
    * Regime caveat (measured, SCALE.md round-10): the gate runs at
    * HIGH probe coverage (nprobe/cells = 14/16), where structure
    * staleness is the binding recall term and a rebuild strictly
    * repairs it. At production cell counts (cells ≈ √n, coverage
    * O(10)/√n) the StressDrift curves show the probe BUDGET binding
    * instead: under uniform-pull drift the stale assignment ordering
    * is largely preserved (centroid·drifted ≈ 0.86·centroid·orig +
    * a near-constant pull term), stale recall stays flat-to-rising
    * in the append count, and a rebuild at fixed nprobe can even
    * LOSE recall by re-balancing cells onto the dense drifted
    * cluster and spreading each query's lineage neighbors across
    * more cells. Operational order at scale: raise nprobe toward
    * coverage first (14→42 probes bought +0.07-0.18 recall at every
    * drift level at 20k), rebuild second. */
  def ivfPqDriftRecall(spark: SparkSession, dir: String,
      batches: Int = 4, alpha: Double = 0.15, numQueries: Int = 10,
      k: Int = 10, nprobe: Int = 0, rerank: Int = 20): DataFrame = {
    // deliberately NOT spread (r18, measured): parallelizing the
    // interpreted driftedBatch transforms (a ~1.2 s single-task stage)
    // loses more to downstream task fan-out (full = 5 union branches ×
    // 32 partitions feeding every probe/truth job) than it saves —
    // in-session A/B 2.87 (spread) vs 2.40 s (unspread)
    val base = Similarity.normalized(spark, dir).select("vec_id", "vec")
      .localCheckpoint()
    val (staleHits, freshHits, nTrue) = ivfPqDriftCounts(spark, base,
      dir, batches, alpha, numQueries, k, nprobe = nprobe, rerank = rerank)
    spark.range(1).select(
      lit(numQueries.toLong).as("n_queries"),
      lit(if (staleHits * 10L >= nTrue * 7L) 1 else 0)
        .as("stale_recall_ge_70"),
      lit(if (freshHits * 10L >= nTrue * 9L) 1 else 0)
        .as("fresh_recall_ge_90"),
      lit(if (freshHits * 10L >= staleHits * 10L - nTrue) 1 else 0)
        .as("rebuild_no_regression"))
  }

  val ivfPqDriftRecallSql: String =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
      |       1 AS stale_recall_ge_70, 1 AS fresh_recall_ge_90,
      |       1 AS rebuild_no_regression
      |FROM embeddings WHERE vec_id < 10""".stripMargin
}
