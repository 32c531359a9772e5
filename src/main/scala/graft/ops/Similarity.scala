package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`). Extension beyond the reference
  * surface (SURVEY §7 step 7).
  *
  * Two paths, as a real pipeline would ship them:
  *  - Brute-force cosine — the exactness baseline. All vector math runs
  *    through the codegen'd [[graft.functions.DotProduct]] expression on
  *    pre-normalized unit vectors (cosine ≡ dot), with the small query
  *    side broadcast: the corpus streams through whole-stage codegen
  *    once, no shuffle of the big side.
  *  - Sign-LSH bucketed — the 100 TB path. Random-hyperplane sign bits
  *    bucket the corpus; candidates only form inside buckets, then
  *    exact cosine verifies. Cost scales with bucket occupancy, not
  *    corpus².
  */
object Similarity {

  /** Embeddings with unit-normalized double vectors. */
  def normalized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      normalize(toDoubleVec(col("embedding"))).as("vec"))

  /** Exact top-k neighbors (cosine, descending; vec_id tie-break) for
    * each of the first `numQueries` vectors, self-match excluded.
    * Output carries ranks, not scores: ranks are integers and
    * hash-stable across engines, while raw cosines differ in the last
    * ulp. */
  def bruteForceTopK(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10): DataFrame =
    // the exact twin every ANN recall gate compares against — memoized
    // (Scratch discipline) so the full-corpus scoring scan runs once
    // per (session, dir, queries, k), not once per recall gate
    Scratch.memo(spark, s"brute:$dir:$numQueries:$k") {
      val corpus = normalized(spark, dir)
      bruteForceTopKFor(corpus,
        corpus.where(col("vec_id") < numQueries)
          .select(col("vec_id").as("query_id"), col("vec").as("qvec")), k)
    }

  /** [[bruteForceTopK]] over an explicit candidate corpus and query
    * set — the form recall gates use when the ground truth must range
    * over a RESTRICTED corpus (e.g. the surviving vectors after a
    * delete: a tombstoned vector is not a valid neighbor, so the true
    * top-k is computed without it). */
  def bruteForceTopKFor(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  val bruteForceTopKSql: String =
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |             list_cosine_similarity(q.v, e.v) AS sim
      |      FROM c q JOIN c e ON e.vec_id != q.vec_id
      |      WHERE q.vec_id < 10)
      |SELECT query_id, neighbor_id, rank FROM (
      |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |  FROM s)
      |WHERE rank <= 10""".stripMargin

  /** Exact near-duplicate pairs: cosine ≥ tau over all pairs (a < b).
    * The oracle baseline for [[lshNearDupPairs]]; quadratic by design. */
  def nearDupPairsExact(spark: SparkSession, dir: String,
      tau: Double = 0.4): DataFrame = {
    // call-site scan spread (guide §2.5): the n²/2 dot products run in
    // the STREAM side of the broadcast nested-loop join, i.e. inside
    // the scan stage — a single task on the one-row-group testdata
    // layout. One-pass consumer, so the central-spread iterative-job
    // caveat doesn't apply (measured 1.20 -> 0.38 s at sf0.1).
    val c = Tables.spread(normalized(spark, dir), "vec_id")
    c.as("a").join(c.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        dot(col("a.vec"), col("b.vec")).as("sim"))
      .where(col("sim") >= tau)
      .select("vec_a", "vec_b")
  }

  val nearDupPairsExactSql: String =
    """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |FROM c a JOIN c b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.4""".stripMargin

  // ----- IVF (inverted-file) ANN: the second scale family -----

  /** Coarse centroids for IVF as driver-side literal arrays — the
    * small-k convenience form of [[ivfCentroidsDf]] (one trainer, one
    * set of seeds/iterations/de-bias rules; this just collects the k
    * tiny rows for callers that inline them as plan literals, which is
    * only safe at k ≲ 16 — see the codegen-blowup note on
    * [[ivfCentroidsDf]]). */
  def ivfCentroids(corpus: DataFrame, k: Int): Array[(Int, Array[Double])] =
    ivfCentroidsDf(corpus, k).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Session-scoped centroid cache for the DRIVER-GATE paths — the
    * `ops.Scratch` discipline applied to the collected centroid
    * array: `q_ann_ivf` and `q_ann_ivf_recall` probe the same
    * deterministic centroids, so the k-means build runs once per
    * (session, dir, k) and the recall gate measures the probe, not a
    * second identical build. Keyed by application id: a fresh driver
    * run rebuilds from scratch, and correctness never depends on the
    * cache (the build is seeded-deterministic — caching collapses
    * only REPEATS). Centroids are k×dim doubles — a few KB. */
  private val centroidCache = new java.util.concurrent
    .ConcurrentHashMap[String, Array[(Int, Array[Double])]]()
  private def cachedIvfCentroids(spark: SparkSession, dir: String,
      k: Int, corpus: => DataFrame): Array[(Int, Array[Double])] =
    centroidCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:$dir:$k",
      _ => ivfCentroids(corpus, k))

  /** IVF top-k: corpus partitioned into k centroid cells; each query
    * probes its `nprobe` nearest cells and scans only those. At 100 TB
    * the cell assignment is a materialized column (cluster-by on
    * write), so a query touches nprobe/k of the corpus. Recall vs
    * brute force is gated by [[ivfRecall]] (driver row, ≥ 0.9
    * aggregate) and floored per-query in OpsSpec.
    *
    * nprobe=14 of 16 cells is what meets the 0.9 band at the tiny
    * gate SF. That fraction is an artifact of a 500-vector NEAR-RANDOM
    * test corpus — weak cluster structure scatters true neighbors
    * across cells, so a tiny index must probe most of them. (The old
    * nprobe=6 "0.94 recall" was a measurement artifact of the biased
    * lowest-vec_id seeds: the gate queries vec_id<10 were themselves
    * the centroids, so their neighbors clustered around them by
    * construction. De-biased seeds measure 0.47-0.63 at nprobe=4-6 —
    * the honest number for random data.) At real scale `cells` grows
    * with √n while nprobe stays O(10), and real corpora cluster, so
    * the probed FRACTION shrinks toward nprobe/cells ≪ 1. */
  def ivfTopK(spark: SparkSession, dir: String, numQueries: Int = 10,
      k: Int = 10, cells: Int = 16, nprobe: Int = 0): DataFrame = {
    val np = if (nprobe > 0) nprobe else nprobeAuto(cells)
    val corpus = normalized(spark, dir).cache()
    val cents = cachedIvfCentroids(spark, dir, cells, corpus)
    def bestCells(v: org.apache.spark.sql.Column, n: Int) = {
      val scored = array(cents.map { case (cid, c) =>
        struct(dot(v, array(c.map(lit): _*)).as("sim"), lit(cid).as("cid"))
      }: _*)
      slice(reverse(array_sort(scored)), 1, n)
    }
    val assigned = corpus.withColumn("cell",
      bestCells(col("vec"), 1).getItem(0).getField("cid"))
    val queries = corpus.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        explode(transform(bestCells(col("vec"), np),
          s => s.getField("cid"))).as("cell"))
    val scored = assigned.join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Probe budget that tracks the cell count — the [[lshAutoBits]]
    * discipline applied to nprobe, closing the round-10 StressDrift
    * finding that at production cell counts the probe BUDGET binds
    * recall, not index staleness, while every probe path defaulted a
    * fixed 14 (coverage 14/cells → 0 as cells grow toward √n: the
    * same quiet fixed-structure degradation that made fixed-bit
    * sign-LSH quadratic). nprobe = ⌈3.5·√cells⌉, pinned by the two
    * MEASURED points: 14 at the 16-cell gate (where the 0.9 recall
    * band was calibrated on the near-random gate corpus) and 42 at
    * StressDrift's 141 cells — exactly the sweep point that bought
    * +0.07-0.19 recall over fixed-14 at every drift level. The √
    * interpolation keeps the budget sublinear: coverage 3.5/√cells
    * still shrinks toward 0 at scale (no return to scanning the
    * index), while the absolute budget grows with the occupancy of
    * √n-cell provisioning instead of freezing at the gate's
    * constant. Floored at the historical 14 (gate SFs stay
    * bit-identical) and capped at `cells` (can never probe more
    * cells than exist). Every probe path takes `nprobe = 0` to mean
    * this auto-tune; an explicit positive value always wins. */
  def nprobeAuto(cells: Int): Int =
    math.min(cells,
      math.max(14, math.ceil(3.5 * math.sqrt(cells.toDouble)).toInt))

  /** Per-query IVF hit counts vs the TRUE top-k (the brute-force twin,
    * itself hash-proven against the DuckDB oracle): (query_id, n_hits
    * of k). The spec-level recall instrument. */
  def ivfRecallPerQuery(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 10, cells: Int = 16,
      nprobe: Int = 0): DataFrame = {
    val ivf = ivfTopK(spark, dir, numQueries, k, cells, nprobe)
      .select("query_id", "neighbor_id")
    val brute = bruteForceTopK(spark, dir, numQueries, k)
      .select("query_id", "neighbor_id")
    val hits = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    brute.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
  }

  /** Driver-gate recall row for [[ivfTopK]]: ONE aggregate row
    * asserting the IVF path recovers ≥ 90% of all true top-k
    * neighbors. Emitting the thresholded aggregate — not per-query
    * float recalls — is what makes the row hash-oracle-able: DuckDB
    * cannot re-run the IVF probe, but it can state the invariant
    * ("10 queries, recall band met"), so the driver's hash compare
    * becomes a hard recall assertion instead of a rows-only count.
    * Per-query floors are asserted in OpsSpec, which can see the
    * actual hit counts. Fully deterministic (seeded centroids), so
    * the 0.94 measured at the gate SF never drifts between runs. */
  def ivfRecall(spark: SparkSession, dir: String, numQueries: Int = 10,
      k: Int = 10, cells: Int = 16, nprobe: Int = 0): DataFrame =
    ivfRecallPerQuery(spark, dir, numQueries, k, cells, nprobe)
      .agg(count(lit(1)).as("n_queries"),
        (sum("n_hits") >= math.ceil(0.9 * k * numQueries).toLong)
          .cast("int").as("recall_ge_90"))

  val ivfRecallSql: String =
    """SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
      |       1 AS recall_ge_90
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  /** The materialized form of [[ivfTopK]] — the actual 100 TB layout:
    * embeddings written ONCE partitioned by their IVF cell, so a query
    * scans only its nprobe cell directories via partition pruning
    * (the other cells are never read, not merely filtered). Returns
    * the centroids for probing; OpsSpec asserts the pruned-scan plan
    * shape and result parity with the unindexed path. */
  def buildIvfIndex(spark: SparkSession, dir: String, indexPath: String,
      cells: Int = 16): Array[(Int, Array[Double])] = {
    val corpus = normalized(spark, dir).cache()
    val cents = ivfCentroids(corpus, cells)
    val scored = array(cents.map { case (cid, c) =>
      struct(dot(col("vec"), array(c.map(lit): _*)).as("sim"),
        lit(cid).as("cid"))
    }: _*)
    corpus
      .withColumn("cell",
        slice(reverse(array_sort(scored)), 1, 1)
          .getItem(0).getField("cid"))
      // cell-align BEFORE partitionBy: without it every scan task
      // writes its own file per cell (tasks × cells small files paid
      // on every later probe)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
    cents
  }

  /** Query the persisted index: probe the nprobe best cells for each
    * query vector — the `cell IN (...)` predicate prunes at the
    * DIRECTORY level, so scan cost is nprobe/cells of the corpus. */
  def ivfTopKIndexed(spark: SparkSession, indexPath: String,
      cents: Array[(Int, Array[Double])], numQueries: Int = 10,
      k: Int = 10, nprobe: Int = 0,
      queriesFrom: DataFrame = null): DataFrame = {
    val np = if (nprobe > 0) nprobe else nprobeAuto(cents.length)
    val indexed = spark.read.parquet(indexPath)
    def bestCells(v: org.apache.spark.sql.Column, n: Int) = {
      val scored = array(cents.map { case (cid, c) =>
        struct(dot(v, array(c.map(lit): _*)).as("sim"), lit(cid).as("cid"))
      }: _*)
      slice(reverse(array_sort(scored)), 1, n)
    }
    // query vectors from a SIDE INPUT when the caller has one: the
    // vec_id predicate is a data column, so fetching queries from the
    // index itself full-scans every cell directory before the pruned
    // probe — the exact anti-pattern the ivfPqTopK scaladoc documents
    val querySrc = Option(queriesFrom).getOrElse(indexed)
    val queries = querySrc.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        explode(transform(bestCells(col("vec"), np),
          s => s.getField("cid"))).as("cell"))
    // static IN-list on the partition column → directory-level pruning
    // (a bare join would need DPP); bounded by numQueries × nprobe
    val probeCells = queries.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val scored = indexed
      .where(col("cell").isin(probeCells: _*))
      .join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("vec"), col("qvec")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Deterministic pseudo-random sample of a (vec_id, vec) frame:
    * order by md5 of the SEEDED id, not by vec_id. Centroid/codebook
    * training is statistics, and the lowest-vec_id sample the builds
    * used before this was id-distribution-DEPENDENT: when ids
    * correlate with content (time-ordered crawls do), training sees
    * only the oldest data and the codebooks are biased toward it. The
    * md5 order is a reproducible permutation — same sample every run,
    * every engine, every partitioning — with no id-order correlation;
    * vec_id tiebreak keeps it total even on a hash collision. */
  def hashSample(vectors: DataFrame, n: Int, tag: String = "train")
      : DataFrame =
    vectors.orderBy(
      md5(concat(lit(s"graft:$tag:"), col("vec_id").cast("string"))),
      col("vec_id")).limit(n)

  /** Centroids as a DATAFRAME (cid, cvec): k seeded sample vectors
    * refined by one Lloyd step, with every vec·centroid product
    * computed through a broadcast join — centroids are DATA, never
    * plan literals. The literal-array form ([[ivfCentroids]], fine at
    * k=16 for the ANN probes) embeds k·dim literals into each
    * projection; at k=128 that is 8k+ expressions, past the codegen
    * method-size limit, and the whole scoring drops to interpreted
    * evaluation — measured 113× blowup at the 20× stress scale before
    * this rewrite. The join form is codegen'd at any k.
    *
    * Training cost is bounded on both axes (centroids are statistics,
    * not indexes — the pqCodebooks discipline):
    *  - the Lloyd step runs over a [[hashSample]] of `trainSample`
    *    vectors (0 = auto: max(64k, 32·k), the FAISS
    *    points-per-centroid band), never the full corpus — at 10⁹
    *    vectors the assignment join would otherwise shuffle n·k rows
    *    to build a k-row result;
    *  - past k ≥ 512 the training assignment itself goes through the
    *    two-level coarse probe ([[assignCellsTwoLevel]] — recursive
    *    two-leveling: its own coarse step re-enters here at kc = √k <
    *    512, so the recursion bottoms out single-level), cutting the
    *    sample·k dot count to sample·(√k + wc·√k).
    * Seeds and sample come from the same seeded hash permutation, so
    * the result stays deterministic — just no longer biased toward
    * the lowest ids.
    *
    * `iters` Lloyd rounds (default 5) converge the cells honestly.
    * The single round this ran before was masked by the old seed
    * bias: with lowest-vec_id seeds the gate QUERIES (vec_id < 10)
    * were literally the centroids, so one round looked sufficient —
    * unbiased seeds exposed it at 0.47 IVF-PQ recall. Each round
    * costs one bounded-sample assignment + one k-row aggregate, and
    * empty cells carry their previous centroid forward so k never
    * silently shrinks. Rounds stop early at the Lloyd fixed point
    * (no vector changed cell ⇒ identical means forever after) —
    * output-invariant, so `iters` is a cap, not a count. */
  def ivfCentroidsDf(corpus: DataFrame, k: Int,
      trainSample: Int = 0, iters: Int = 5): DataFrame = {
    val n = if (trainSample > 0) trainSample
      else math.max(65536, 32 * k)
    val sample = hashSample(corpus, n).localCheckpoint()
    // k rows: the window is bounded and intentional
    val seeds = hashSample(sample, k, "seed")
      .withColumn("cid",
        row_number().over(Window.orderBy("vec_id")).cast("int") - 1)
      .select(col("cid"), col("vec").as("cvec")).localCheckpoint()
    var cents = seeds
    var prevAssign: DataFrame = null
    var converged = false
    for (i <- 0 until iters if !converged) {
      // Job-count discipline (r17, guide §1.2 "don't compute things
      // you throw away"): the convergence check on the LAST round can
      // only skip its own round's refine, and recomputing means over
      // an unchanged assignment is bit-identical output — so the last
      // round never checks, and an assignment consumed ONLY by its
      // own refine (no current- or next-round check reads it) skips
      // the localCheckpoint job too. An iters=2 build (the dedup
      // screens) drops 3 jobs; iters=5 (the ANN trainers) drops 2.
      // Mid-loop early exit at the Lloyd fixed point is preserved:
      // if no vector changed cell, recomputing the means reproduces
      // the same centroids bit-for-bit (same assignment, same pinned
      // sample partitions) — the remaining rounds are no-ops.
      val checksNow = prevAssign != null
      val nextChecks = i + 1 <= iters - 2
      val assignPlan = if (k >= 512) assignCellsTwoLevel(sample, cents)
        else assignCells(sample, cents)
      val assign = if (checksNow || nextChecks) assignPlan.localCheckpoint()
        else assignPlan
      converged = checksNow &&
        assign.join(prevAssign
            .withColumnRenamed("cell", "prev_cell"), "vec_id")
          .where(col("cell") =!= col("prev_cell")).count() == 0
      // the previous round's assignment blocks are dead once the
      // convergence check has consumed them — release eagerly (the
      // connectedComponents retention lesson; sample-bounded here,
      // but 5 rounds × 64k+ vectors is still pinned block churn)
      if (prevAssign != null)
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(prevAssign)
      prevAssign = if (nextChecks) assign else null
      if (!converged) {
      // (r17 note: a per-dimension column-aggregate refine — dim avg
      // buffers in one groupBy, no posexplode — was A/B'd and measured
      // SLOWER than this explode form at dim 64: 3.8 vs 3.1 s on
      // q_semantic_dedup; the explode's (cid, pos) partials are
      // cheaper per row than dim nullable avg buffers. Kept as-is.)
      val refined = sample.join(assign, "vec_id")
        .select(col("cell").as("cid"), posexplode(col("vec")))
        .groupBy("cid", "pos").agg(avg("col").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pairs"))
        .select(col("cid"),
          normalize(transform(col("pairs"), p => p.getField("m")))
            .as("cvec"))
      // cells that captured nothing this round keep their previous
      // centroid (left join back) — k never silently shrinks
      cents = cents.select(col("cid"), col("cvec").as("prev_cvec"))
        .join(refined, Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("cvec"), col("prev_cvec")).as("cvec"))
        .localCheckpoint()
      }
      // an assignment checkpointed ONLY for its own round's check
      // (no next-round check keeps a handle) is dead once the refine
      // above materialized through it — release its blocks here
      if (checksNow && !nextChecks)
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(assign)
    }
    cents
  }

  /** Top-`nprobe` centroid assignment. nprobe=1 is a SHUFFLE-FREE
    * codegen map pass: the whole centroid table rides in as one
    * broadcast array row and [[graft.functions.BestCell]] computes
    * the exact argmax per vector in a primitive loop — same dots,
    * same lowest-cid tie-break as the join form, so the result is
    * bit-identical, but the n·k scored exchange is gone entirely
    * (measured 290 s → map-side at 1M×1k cells). nprobe>1 keeps the
    * broadcast-join + rank shape: the scored stream carries only
    * (vec_id, cid, sim), vectors never ride through the shuffle. */
  def assignCells(vectors: DataFrame, cents: DataFrame,
      nprobe: Int = 1): DataFrame =
    if (nprobe == 1) {
      val arr = cents.agg(collect_list(struct(col("cid"), col("cvec")))
        .as("cc"))
      vectors.select(col("vec_id"), col("vec"))
        .crossJoin(broadcast(arr))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.bestCell(col("vec"), col("cc"))
            .getField("cid").as("cell"))
    } else
      pickCells(vectors.select(col("vec_id"), col("vec"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          dot(col("vec"), col("cvec")).as("sim")), nprobe)

  /** Shared tail of the cell assigners: reduce a scored (vec_id, cid,
    * sim) stream to each vector's top-`nprobe` cells. nprobe=1 is a
    * map-side-combined max_by; nprobe>1 ranks per vector. The shuffle
    * carries only ids and one double either way. */
  private def pickCells(scored: DataFrame, nprobe: Int): DataFrame =
    if (nprobe == 1)
      scored.groupBy("vec_id")
        .agg(max_by(col("cid"),
          struct(col("sim"), (-col("cid")).cast("double"))).as("cell"))
    else {
      val w = Window.partitionBy("vec_id")
        .orderBy(col("sim").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= nprobe)
        .select(col("vec_id"), col("cid").as("cell"))
    }

  /** Coarse quantizer over the centroid table itself — level 2 of the
    * two-level IVF probe: ~√k super-cells clustering the k fine
    * centroids, built by the same seeded-sample + one-Lloyd-step
    * machinery ([[ivfCentroidsDf]] applied to the centroids as if they
    * were the corpus). */
  def coarseCentroids(cents: DataFrame, kc: Int): DataFrame =
    ivfCentroidsDf(
      cents.select(col("cid").as("vec_id"), col("cvec").as("vec")), kc)
      .select(col("cid").as("ccid"), col("cvec").as("ccvec"))

  /** Two-level cell assignment — the ≥10⁹-vector shape promised by the
    * [[semanticDedupClusters]] scale note: instead of scoring every
    * vector against all k centroids (n·k dots and an n·k-row argmax
    * shuffle — the assignment term that dominates once k = nprobe·√n
    * grows past ~10³), score against ~√k COARSE centroids, keep each
    * vector's best `coarseProbe` super-cells, and score only the fine
    * centroids living in those. Work per vector: kc + wc·k/kc dots
    * (kc=√k, wc=coarseProbe) vs k — at k=1800 / wc=4 that is ~6× fewer
    * dot products, and the same factor off the argmax shuffle volume.
    *
    * Plan shape: the coarse table rides in as ONE broadcast row (an
    * array of kc structs), so the per-vector top-wc probe is computed
    * entirely map-side by array expressions — no shuffle, and no
    * plan-literal centroids (the k=128 codegen blowup documented on
    * [[ivfCentroidsDf]]). Fine centroids arrive pre-grouped by coarse
    * cell via a second broadcast; vectors never shuffle. The only
    * exchange is [[pickCells]]'s id-only argmax, now wc·k/kc wide per
    * vector instead of k.
    *
    * `coarseProbe` is the recall knob: a vector's true best fine
    * centroid can live in a coarse cell the probe skipped. wc = kc
    * degenerates to exact single-level assignment (every fine centroid
    * scored — asserted in PipelineOpsSpec). The default wc=6 keeps
    * dedup pair recall at single-level parity (wc=4 measured one
    * recall notch below the single-level path at spec scale) while
    * still cutting the k=1789 stress assignment ~6×. */
  def assignCellsTwoLevel(vectors: DataFrame, cents: DataFrame,
      nprobe: Int = 1, coarseK: Int = 0, coarseProbe: Int = 6): DataFrame = {
    val k = cents.count().toInt
    val kc = if (coarseK > 0) coarseK
      else math.max(2, math.round(math.sqrt(k.toDouble)).toInt)
    val wc = math.min(kc, math.max(coarseProbe, nprobe))
    val coarse = coarseCentroids(cents, kc).localCheckpoint()
    // fine → coarse: each of the k fine centroids keeps its best
    // super-cell (k rows total; ties to the lowest ccid)
    val packedFine = cents.crossJoin(broadcast(coarse))
      .select(col("cid"), col("cvec"), col("ccid"),
        dot(col("cvec"), col("ccvec")).as("sim"))
      .groupBy("cid")
      .agg(max_by(struct(col("ccid"), col("cvec")),
        struct(col("sim"), (-col("ccid")).cast("double"))).as("b"))
      .select(col("b.ccid").as("ccid"), col("cid"), col("b.cvec").as("cvec"))
      .groupBy("ccid")
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("fines"))
    // whole coarse table as one broadcast array row: top-wc super-cells
    // per vector computed map-side, no shuffle. LIVE cells only: a
    // coarse centroid carried forward from an empty Lloyd cell can be
    // NO fine centroid's best — probing it would score zero fines,
    // and a vector whose top-wc cells were all such orphans would
    // vanish from the inner join below (dropped from every downstream
    // index join, unsearchable forever). Restricting the probe array
    // to packedFine's ccids guarantees every probed cell joins ≥ 1
    // fine, so no vector can drop; orphans contributed nothing to
    // scoring anyway (output unchanged when none exist).
    val coarseArr = coarse
      .join(packedFine.select("ccid"), Seq("ccid"), "left_semi")
      .agg(collect_list(struct(col("ccid"), col("ccvec"))).as("cc"))
    val probed = vectors.select(col("vec_id"), col("vec"))
      .crossJoin(broadcast(coarseArr))
      .select(col("vec_id"), col("vec"),
        explode(slice(reverse(array_sort(transform(col("cc"),
          c => struct(dot(col("vec"), c.getField("ccvec")).as("sim"),
            c.getField("ccid").as("ccid"))))), 1, wc)
          .getField("ccid")).as("ccid"))
    val scored = probed.join(broadcast(packedFine), "ccid")
      .select(col("vec_id"),
        explode(transform(col("fines"),
          f => struct(dot(col("vec"), f.getField("cvec")).as("sim"),
            f.getField("cid").as("cid")))).as("sc"))
      .select(col("vec_id"), col("sc.cid").as("cid"),
        col("sc.sim").as("sim"))
    pickCells(scored, nprobe)
  }

  /** SemDeDup-style semantic dedup: cluster embeddings by their IVF
    * cell, verify cosine ≥ tau only WITHIN cells, then connected
    * components over the verified pairs; the survivor of each
    * component is its min vec_id. The embedding analogue of the
    * LSH→clusters text flow (Components.lshDedupClusters): candidate
    * generation is bucketed (cell join, cost ∝ cell occupancy²·cells,
    * not corpus²), verification is exact, clustering is the same
    * pointer-jumping CC.
    *
    * THE scale knob is the cell count: candidate volume is
    * n²·nprobe²/cells while centroid assignment is n·cells dots, so a
    * FIXED cell count quietly degrades the cell join toward all-pairs
    * (measured at the 20× stress: 128 fixed cells ⇒ occupancy 1250 ⇒
    * 94.6M candidates = 12% of all-pairs, 265 s; auto-scaled ⇒
    * 132 s total). The sum is minimized at cells ≈ nprobe·√n — total
    * work Θ(n^1.5), the classic single-level IVF trade — which
    * `cells = 0` (the default) self-tunes to; the join-based centroid
    * path supports any k. Beyond ~10⁹ vectors a two-level centroid
    * probe (√k coarse cells over the centroid table itself) takes the
    * assignment term down again; the single-level shape here is the
    * right default below that.
    *
    * Shuffle discipline: identical vectors collapse to one
    * representative BEFORE candidate generation (see the inline
    * comment — the m²-per-clique fix, output-invariant), and
    * verification runs INSIDE the cell self-join: each vector rides
    * the one cell-keyed exchange nprobe times carrying its probe-cell
    * set, each pair's dot computes exactly once (at the smallest
    * shared probe cell), and only verified id pairs come out — no
    * candidate materialization, no distinct, which is what survives
    * the Θ(n^1.5) candidate volume at 10⁶+ vectors (measured at 1M,
    * SCALE.md). Cross-cell near-dup pairs are missed by construction
    * (that is the recall/cost trade; nprobe buys recall — measured
    * 1.0 at nprobe=4); recall and pair precision vs the exact-pair
    * clustering are asserted in PipelineOpsSpec. Rows-only at the
    * driver gate: centroid averaging is float arithmetic, not
    * bit-portable across engines. */
  /** Tau-verified near-dup pairs over an already-collapsed corpus of
    * unit vectors — the middle of [[semanticDedupClusters]], shared
    * with the screened hybrid ([[semanticDedupClustersScreened]]).
    * `corpus` must be duplicate-collapsed (identical vectors reduced
    * to one representative — the m²-per-clique precondition) and
    * cached by the caller; returns verified (src, dst) id pairs with
    * cosine ≥ tau, each pair's dot computed exactly once at its
    * smallest shared probe cell. */
  private def tauVerifiedPairs(corpus: DataFrame, tau: Double,
      cells: Int, nprobe: Int, twoLevelFrom: Int): DataFrame = {
    val k =
      if (cells > 0) cells
      else math.min(4096, math.max(16,
        (nprobe * math.sqrt(corpus.count().toDouble)).toLong)).toInt
    // 2 Lloyd rounds, not the ANN default 5: cells here only GENERATE
    // candidates (exact cosine verifies every pair), so rough locality
    // is enough — pair precision/recall vs the exact clustering stay
    // 1.0 (PipelineOpsSpec), and the build saves 3 assignment rounds
    val cents = ivfCentroidsDf(corpus, k, iters = 2).localCheckpoint()
    // multi-probe candidates: each vector lists its nprobe nearest
    // cells; a pair is a candidate if the probe sets intersect.
    // past ~512 cells the single-level n·k assignment term dominates;
    // switch to the two-level probe (recall-neutral at the default
    // coarseProbe, measured at the 20× stress — see SCALE.md). The
    // driver-gate SF stays single-level (k ≈ 90 at sf0.01), so the
    // registered query's output is untouched by the switch.
    val buckets = (if (k >= twoLevelFrom)
        assignCellsTwoLevel(corpus, cents, nprobe)
      else assignCells(corpus, cents, nprobe))
      .localCheckpoint()
    // Verify INSIDE the cell join, exactly once per pair — the shape
    // that survives the Θ(n^1.5) candidate volume. Materializing
    // candidate ids first (the old shape: self-join → distinct →
    // re-attach both vectors by id) moves every candidate through a
    // distinct exchange and then ships TWO full vectors per surviving
    // candidate row through id-keyed joins — at 10⁶ vectors that is
    // ~2·10⁹ pair rows and terabytes of vector traffic. Here each
    // vector rides the ONE cell-keyed exchange (nprobe copies of
    // (vec, probe-set)), the dot product runs inside the join, and
    // only pairs ≥ tau come out. The probe-set column (nprobe ints)
    // makes each pair verify at its SMALLEST shared cell only, so no
    // distinct is needed and no dot is computed twice.
    val probes = buckets.groupBy("vec_id")
      .agg(sort_array(collect_list(col("cell"))).as("cells"))
      .join(corpus.select("vec_id", "vec"), "vec_id")
    val sided = probes.select(col("vec_id"), col("vec"), col("cells"),
      explode(col("cells")).as("cell"))
    sided.as("a")
      .join(sided.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(col("a.cell") ===
          array_min(array_intersect(col("a.cells"), col("b.cells"))) &&
        dot(col("a.vec"), col("b.vec")) >= tau)
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
  }

  def semanticDedupClusters(spark: SparkSession, dir: String,
      tau: Double = 0.4, cells: Int = 0, nprobe: Int = 4,
      twoLevelFrom: Int = 512): DataFrame =
    // same memo discipline as [[semanticDedupClustersScreened]]: the
    // survivor view and the registered query share one label build
    Scratch.memo(spark,
        s"sem-clusters:$dir:$tau:$cells:$nprobe:$twoLevelFrom") {
      semanticDedupClustersBuild(spark, dir, tau, cells, nprobe,
        twoLevelFrom)
    }

  private def semanticDedupClustersBuild(spark: SparkSession, dir: String,
      tau: Double, cells: Int, nprobe: Int,
      twoLevelFrom: Int): DataFrame = {
    val corpusAll = normalized(spark, dir).cache()
    // exact-duplicate collapse before candidate generation — the
    // [[Components.collapseExact]] discipline applied to VECTORS.
    // Identical embeddings (the same content embedded twice — routine
    // at corpus scale) are cosine-1 pairs, always ≥ tau, so every
    // member of an identical-vector group belongs to its
    // representative's cluster and every neighbor decision for a
    // member is the same pure function of the two vectors as for the
    // rep: clustering reps only and adding rep→member star edges is
    // output-invariant. Without it the within-cell candidate join is
    // quadratic per clique — m copies of one vector contribute m²/2
    // pairs in EVERY probed cell (measured: the m² term dominated the
    // 1M-vector stress before this collapse, see SCALE.md). Grouping
    // is by a 128-bit CONTENT HASH of the vector (two independent
    // xxhash64 seeds), not the vector value: equal vectors always
    // share a key, so the grouping is identical up to a 128-bit
    // collision (~n²/2¹²⁹ — negligible at any feasible corpus), and
    // the group-by partials and the star join move a 16-byte key
    // instead of the dim·8-byte vector — at 10⁹ × 64-dim that is the
    // difference between a 16 GB and a 512 GB exchange.
    val vhash = struct(xxhash64(col("vec")).as("h1"),
      xxhash64(lit("graft:vhash2"), col("vec")).as("h2"))
    val hashed = corpusAll.select(col("vec_id"), vhash.as("vh"))
    val reps = hashed.groupBy("vh")
      .agg(min("vec_id").as("rep_id"))
    val corpus = corpusAll.join(
        reps.select(col("rep_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
      .cache()
    val stars = hashed
      .join(reps, "vh")
      .where(col("vec_id") =!= col("rep_id"))
      .select(col("rep_id").as("src"), col("vec_id").as("dst"))
    val pairs = tauVerifiedPairs(corpus, tau, cells, nprobe, twoLevelFrom)
    // every vector is a node; duplicate members connect through their
    // rep's star edge, so component labels (min reachable id) — hence
    // survivor sets — are what the uncollapsed flow would produce
    val clusters = Components.connectedComponents(
        corpusAll.select(col("vec_id").as("node")),
        pairs.unionByName(stars))
      .select(col("node").as("vec_id"), col("component").as("cluster"))
    // connectedComponents ran its driver loop above and checkpointed
    // every round, so nothing downstream reads the corpus caches —
    // drop them here rather than letting cached vector partitions
    // pile up across calls in a long-lived session
    corpus.unpersist()
    corpusAll.unpersist()
    clusters
  }

  /** Survivors of [[semanticDedupClusters]]: one representative (min
    * vec_id) per semantic cluster — the rows a training mix keeps. */
  def semanticDedupSurvivors(spark: SparkSession, dir: String): DataFrame =
    semanticDedupClusters(spark, dir)
      .where(col("vec_id") === col("cluster"))
      .select(col("vec_id"))

  /** SCREEN-FIRST hybrid semantic dedup — the composition the r9
    * measurements argued for: the centroid screen
    * ([[semanticDedupCentroidFor]], one map stage + one cell exchange,
    * no pairwise term) collapses the DUPLICATE regime (exact copies
    * and near-identical vectors, the cliques that make even collapsed
    * pairwise verification quadratic), then tau-level pairwise
    * clustering ([[tauVerifiedPairs]] → CC) runs over the screen
    * SURVIVORS only; screen members rejoin their representative's
    * component through star edges.
    *
    * Why both stages: the screen alone is 1-D single-linkage on the
    * centroid-sim axis — exhaustive in the duplicate regime (gate-
    * proven: 100% exact copies, ≥90% near copies) but blind to
    * moderate-similarity pairs (measured 2/66 at tau=0.4); the
    * pairwise stage alone pays the m²-per-clique term on duplicate-
    * heavy corpora even after exact-vector collapse (near-copies are
    * NOT exact-equal, so `collapseExact`'s group-by-value never sees
    * them — SCALE.md: 189.7 s pairwise vs 13.0 s screen at 200k on a
    * 100×-duplicated corpus). Screen-first gets both: duplicate
    * cliques never reach the pair join (each clique enters as ONE
    * representative), and tau semantics still decide every surviving
    * pair by exact cosine.
    *
    * Screen proposes, cosine disposes: the screen's 1-D single-
    * linkage has a documented false-positive mode (distinct vectors
    * equidistant from a centroid chain together — measured ~180
    * spurious co-pairs on the 1500-vector planted spec corpus before
    * this), so every screen-proposed member is VERIFIED with one
    * exact dot against its representative before it is dropped:
    * cos(member, rep) ≥ tau keeps the merge (the star edge is then a
    * true tau edge), anything else falls back into the pairwise pool
    * and gets full tau treatment. One dot per vector — Θ(n), two
    * id-keyed joins — so the no-pairwise-term property of the screen
    * is preserved while precision vs the exact tau closure becomes
    * 1.0 UNCONDITIONALLY (every co-pair traces through exact-cosine-
    * verified edges only; asserted in PipelineOpsSpec). A near-copy
    * straddling a cell boundary survives as its own node and is
    * caught by the pairwise stage — so planted near-duplicates
    * co-cluster 100%, stronger than the screen-alone ≥90% band.
    * Remaining divergence vs the unscreened path: a member is
    * verified against its REP only, so a moderate-similarity CHAIN
    * (member—other ≥ tau but member—rep ≥ tau decides the drop)
    * can route through the rep rather than the chain — same
    * single-linkage closure, recall-band-equivalent (spec'd).
    *
    * Scale shape: screen = one best-cell map pass + per-cell sort;
    * the pairwise stage sees only survivors (duplicate-heavy corpora
    * shrink toward their distinct content), so the Θ(m^1.5) pair term
    * runs at m = survivors ≪ n. Stage costs at 200k/1M are SCALE.md
    * rows. */
  def semanticDedupClustersScreened(spark: SparkSession, dir: String,
      tau: Double = 0.4, eps: Double = 5e-4, cells: Int = 0,
      nprobe: Int = 4, twoLevelFrom: Int = 512): DataFrame =
    // session-memoized (r18, guide §1.2 "don't recompute"): the gate
    // composition (trainingShardsSemanticGate → semanticDropIds) and
    // the registered query both need the identical label frame; the
    // memo is the sanctioned cluster-label-table exception in
    // [[Scratch.memo]] — one (vec_id, cluster) row per vector, the
    // artifact a production pipeline materializes once per corpus
    Scratch.memo(spark,
        s"sem-screened:$dir:$tau:$eps:$cells:$nprobe:$twoLevelFrom") {
      semanticDedupClustersScreenedFor(normalized(spark, dir), tau, eps,
        cells, nprobe, twoLevelFrom)
    }

  /** [[semanticDedupClustersScreened]] over any (vec_id, vec) frame of
    * unit vectors. */
  def semanticDedupClustersScreenedFor(vectors: DataFrame,
      tau: Double = 0.4, eps: Double = 5e-4, cells: Int = 0,
      nprobe: Int = 4, twoLevelFrom: Int = 512): DataFrame = {
    val corpusAll = vectors.select("vec_id", "vec").cache()
    // stage 1 — the screen. Its cluster label is the min member id, so
    // survivors are exactly the rows labeled with their own id. The
    // screen subsumes collapseExact: identical vectors share a cell
    // (deterministic tie-break), identical centroid-sim, gap 0.
    val screen = semanticDedupCentroidForCached(corpusAll, eps, cells)
      .localCheckpoint()
    // verify every proposed merge with ONE exact dot against the
    // representative (see scaladoc): Θ(n) — two id-keyed joins, the
    // vectors ride once each, no pair term. Slim (vec_id, cluster)
    // checkpoint; the vector columns never leave this block.
    val proposed = screen.where(col("vec_id") =!= col("cluster"))
      .join(corpusAll, "vec_id")
      .join(corpusAll.select(col("vec_id").as("cluster"),
        col("vec").as("rvec")), "cluster")
      .where(dot(col("vec"), col("rvec")) >= tau)
      .select(col("vec_id"), col("cluster"))
      .localCheckpoint()
    val stars = proposed
      .select(col("cluster").as("src"), col("vec_id").as("dst"))
    // pairwise pool = everyone not verified-dropped (screen survivors
    // AND rejected members)
    val corpus = corpusAll.join(proposed.select("vec_id"),
        Seq("vec_id"), "left_anti")
      .cache()
    // stage 2 — tau-level pairwise clustering on survivors only
    val pairs = tauVerifiedPairs(corpus, tau, cells, nprobe, twoLevelFrom)
    val clusters = Components.connectedComponents(
        corpusAll.select(col("vec_id").as("node")),
        pairs.unionByName(stars))
      .select(col("node").as("vec_id"), col("component").as("cluster"))
    corpus.unpersist()
    corpusAll.unpersist()
    clusters
  }

  /** SemDeDup-paper screening variant: dedup by CENTROID proximity
    * instead of pairwise verification — the Θ(n) scale path for
    * corpora whose near-dup cliques make even collapsed pairwise
    * verification quadratic (Abbas et al. 2023, "SemDeDup", §3:
    * cluster, then treat same-cluster points at near-identical
    * distance-to-centroid as semantic duplicates).
    *
    * Shape: one nearest-cell assignment per vector (n·O(√k) dots via
    * the two-level probe), ONE dot to the owning centroid, then a
    * per-cell sort on that scalar. Same-cell members whose
    * consecutive centroid-similarities differ by ≤ `eps` chain into
    * one group; each group keeps its min vec_id. Runs/groups are
    * computed by a running sum over the per-cell window — no pair is
    * ever materialized, so cost is O(n log occupancy) regardless of
    * clique structure. That is the trade: pairwise-exact semantics
    * are replaced by 1-D single-linkage on the centroid-sim axis —
    * two distinct vectors equidistant from the centroid can merge
    * (false positive), a near-dup pair straddling a cell boundary
    * can split (false negative), and eps-chaining has the usual
    * single-linkage transitivity artifact. Identical vectors always
    * collapse: same cell (deterministic tie-break), identical sim,
    * gap 0. Precision/recall vs the exact pairwise clustering are
    * measured in PipelineOpsSpec and driver-gated by
    * [[semanticDedupCentroidGate]].
    *
    * Determinism: assignment ties break to the lowest cid, the cell
    * sort breaks sim ties by vec_id, and the running-sum grouping is
    * a pure function of that order — deterministic given the seeded
    * centroid build (float-seeded like [[semanticDedupClusters]],
    * hence rows-only at the driver; the gate row is the hash-exact
    * form). Returns (vec_id, cluster) with cluster = min member id. */
  def semanticDedupCentroid(spark: SparkSession, dir: String,
      eps: Double = 5e-4, cells: Int = 0): DataFrame =
    semanticDedupCentroidFor(normalized(spark, dir), eps, cells)

  /** [[semanticDedupCentroid]] over any (vec_id, vec) frame of unit
    * vectors — the form the gate uses to screen a corpus with planted
    * duplicate structure. */
  def semanticDedupCentroidFor(vectors: DataFrame, eps: Double = 5e-4,
      cells: Int = 0): DataFrame = {
    val corpus = vectors.select("vec_id", "vec").cache()
    val out = semanticDedupCentroidForCached(corpus, eps, cells)
    corpus.unpersist()
    out
  }

  /** [[semanticDedupCentroidFor]] over a corpus the CALLER has cached
    * (and will unpersist) — the composition form: the screened hybrid
    * shares one cache across the screen and the pairwise stage, and a
    * nested cache/unpersist here would evict the caller's entry
    * mid-flow (Spark's cache manager matches by plan). The dominant
    * best-cell pass is materialized eagerly below, so by return time
    * the input cache has served every read this function makes. */
  private def semanticDedupCentroidForCached(corpus: DataFrame,
      eps: Double, cells: Int): DataFrame = {
    // √n cells, NOT the pairwise path's 4√n: cells here provide only
    // duplicate-regime locality (near-identical vectors must share a
    // cell — true at any reasonable granularity), not candidate-pair
    // pruning, and the centroid BUILD is the screen's dominant cost
    // term (measured: the 4√n build was ~2/3 of the 200k screen).
    // Coarser cells cut the build ~4× and even help recall (fewer
    // boundary splits); the price is a longer 1-D run per cell —
    // occupancy √n instead of √n/4 — which the per-cell sort absorbs.
    val k =
      if (cells > 0) cells
      else math.min(4096, math.max(16,
        math.sqrt(corpus.count().toDouble).toLong)).toInt
    val cents = ivfCentroidsDf(corpus, k, iters = 2).localCheckpoint()
    // assignment AND the owning-centroid similarity in one shuffle-free
    // codegen pass ([[graft.functions.BestCell]]): the n·√n dot count
    // runs map-side over the broadcast centroid array — no n·k scored
    // exchange, no re-join of the corpus, no two-level machinery
    // (exact argmax at this k is cheaper than the pruned probe's
    // explode/shuffle shape; at 10⁹ rows this stays one map stage)
    val centsArr = cents
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("cc"))
    // the best-cell pass is the screen's dominant term (n·k dots) and
    // the ONLY consumer of the full vectors after the centroid build —
    // materialize its slim (vec_id, cell, sim) output eagerly so the
    // input cache is actually alive when the dots run. (Unpersisting
    // in the caller before the lazy result materialized meant the
    // cache covered only the count and centroid build; the final pass
    // re-normalized the whole corpus from scratch.) The checkpoint is
    // 3 fixed-width columns per row — ~20 bytes/doc, disk-spillable —
    // and its blocks are released by the ContextCleaner when the
    // returned plan is collected.
    val scored = corpus.crossJoin(broadcast(centsArr))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.bestCell(col("vec"), col("cc"))
          .as("b"))
      .select(col("vec_id"), col("b.cid").as("cell"),
        col("b.sim").as("sim"))
      .localCheckpoint()
    val w = Window.partitionBy("cell").orderBy(col("sim").desc, col("vec_id"))
    val grouped = scored
      .withColumn("gap", lag(col("sim"), 1).over(w) - col("sim"))
      .withColumn("newg",
        when(col("gap").isNull || col("gap") > eps, 1L).otherwise(0L))
      .withColumn("grp", sum("newg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped
      .withColumn("cluster", min("vec_id")
        .over(Window.partitionBy("cell", "grp")))
      .select("vec_id", "cluster")
  }

  /** Driver gate for [[semanticDedupCentroid]] — the thresholded-
    * aggregate trick ([[ivfRecall]]). The provisioned gate corpus has
    * NO duplicate-regime pairs (nothing above cosine 0.6), so the
    * gate PLANTS the structure the screen exists to remove — from the
    * data itself, deterministically: every base vector gets an exact
    * copy (vec_id + n) and a near-copy (vec_id + 2n: the vector mixed
    * with 0.001 of its own reversal, re-normalized — cosine to the
    * base ≳ 1 − 10⁻⁶, the SemDeDup duplicate regime). ONE hash-exact
    * row then asserts over the screened 3n-vector corpus:
    * (a) every vector labeled exactly once; (b) ALL planted
    * exact-copy pairs share a cluster (identical vectors are
    * same-cell, gap-0 by construction — this must be 100%);
    * (c) ≥ 90% of planted near-copy pairs share a cluster (a
    * near-copy can straddle a cell boundary; the band leaves room
    * for those edge cases while still proving the screen works in
    * its target regime). DuckDB cannot re-run the screen, but it can
    * state the invariant, so the hash compare is a hard assertion on
    * all three. */
  def semanticDedupCentroidGate(spark: SparkSession, dir: String)
      : DataFrame = {
    val base = normalized(spark, dir).select("vec_id", "vec")
      .localCheckpoint()
    val n = base.count()
    val copies = base.select((col("vec_id") + n).as("vec_id"), col("vec"))
    val nearCopies = base.select((col("vec_id") + 2 * n).as("vec_id"),
      normalize(zip_with(col("vec"), reverse(col("vec")),
        (a, b) => a + lit(0.001) * b)).as("vec"))
    val augmented = base.unionByName(copies).unionByName(nearCopies)
    // memoized label table (r18, the trainingShardsSemanticGate
    // discipline): the planted corpus is a pure function of the dir,
    // so the bench's repeat pass reuses one screen build
    val cent = Scratch.memo(spark, s"sem-centroid-planted:$dir") {
      semanticDedupCentroidFor(augmented)
    }
    // planted pair (i, i+off) is caught iff both sides carry the same
    // cluster label
    def caught(off: Long): Long = cent.as("x")
      .join(cent.as("y"), col("x.vec_id") + off === col("y.vec_id") &&
        col("x.vec_id") < n)
      .where(col("x.cluster") === col("y.cluster"))
      .count()
    // the two planted-pair probes are independent joins over the
    // checkpointed labels — overlap them (guide §2.6)
    val (exactCaught, nearCaught) =
      graft.core.Par.both(caught(n), caught(2 * n))
    cent.agg(
      count(lit(1)).as("n_labeled"),
      countDistinct(col("vec_id")).as("n_vectors"))
      .select(
        (col("n_labeled") === 3 * n && col("n_vectors") === 3 * n)
          .cast("int").as("labels_total"),
        lit(if (exactCaught == n) 1 else 0).as("exact_copies_collapsed"),
        lit(if (nearCaught * 10L >= n * 9L) 1 else 0)
          .as("near_copies_ge_90"))
  }

  val semanticDedupCentroidGateSql: String =
    """SELECT 1 AS labels_total, 1 AS exact_copies_collapsed,
      |       1 AS near_copies_ge_90
      |FROM embeddings LIMIT 1""".stripMargin

  // ----- Cluster-balanced sampling (the topic axis of mixing) -----

  /** Per-cell sizes and keep-quotas for [[clusterBalancedSample]]:
    * quota_c ∝ size_c^alpha (alpha < 1 flattens — mega-topics
    * downweighted, tail topics kept whole), scaled to a global budget
    * of budgetPct% of the corpus, floored at 1 so no topic vanishes.
    * k rows — driver math on a collected frame, like the centroid
    * cache itself. */
  /** Shared sampler defaults — the GATE recomputes quotas
    * independently, so these live in ONE place: changing a default in
    * the sample call alone would silently leave the gate asserting
    * against stale parameters (the r12 ADVICE hazard). */
  private[ops] val SampleK = 16
  private[ops] val SampleAlpha = 0.5
  private[ops] val SampleBudgetPct = 25

  private[ops] def clusterQuotas(sizes: Array[(Int, Long)],
      alpha: Double, budgetPct: Int): Seq[(Int, Long, Long)] = {
    val total = sizes.map(_._2).sum
    val budget = total * budgetPct / 100
    val wts = sizes.map { case (c, sz) => (c, math.pow(sz.toDouble, alpha)) }
    val wsum = wts.map(_._2).sum
    val quotas = wts.map { case (c, w) =>
      (c, math.max(1L, math.floor(budget * w / wsum).toLong)) }.toMap
    sizes.toSeq.map { case (c, sz) => (c, sz, quotas(c)) }
  }

  /** Sizes + quotas from an ALREADY-COMPUTED assignment — the
    * assignment pass is the only corpus-sized work in the sampler, so
    * callers compute it once and derive both the quota frame and the
    * ranked selection from the same frame. */
  private def clusterQuotaFrame(assign: DataFrame,
      alpha: Double, budgetPct: Int): DataFrame = {
    val spark = assign.sparkSession
    import spark.implicits._
    val sizes = assign.groupBy("cell").agg(count(lit(1)).as("sz"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    clusterQuotas(sizes, alpha, budgetPct).toDF("cell", "sz", "quota")
  }

  /** Cluster-balanced corpus sample over the EMBEDDING space — the
    * topic axis of corpus mixing, complementing [[Mix]]'s source axis
    * (DataComp-style cluster balancing): k-means cells stand in for
    * topics; each cell keeps min(quota, size) vectors, selected by
    * deterministic hash rank (md5 of the vec_id string — no `rand()`,
    * partitioning-invariant, reproducible across runs because the
    * centroids are the seeded [[ivfCentroidsDf]] build).
    *
    * Output: every vector, labeled (cell, selected ∈ {0,1}) — the
    * audit-friendly form; filtering `selected = 1` is the sample.
    *
    * Scale shape: assignment is the shuffle-free BestCell map pass;
    * sizes/quotas are a k-row driver frame; the only shuffle is the
    * per-cell rank window (partitioned by cell — parallel across
    * cells). For mega-cells where a full per-cell sort is unwanted,
    * the hash-rank selection degrades gracefully to a hash-threshold
    * screen (keep if bucket < quota/size) at the cost of ±binomial
    * noise on the quota — the exact-rank form is kept here because
    * the gate asserts exact per-cell counts. Rows-only registered
    * query (float centroids aren't oracle-portable);
    * [[clusterBalancedSampleGate]] is the hash-exact driver gate. */
  def clusterBalancedSample(spark: SparkSession, dir: String,
      k: Int = SampleK, alpha: Double = SampleAlpha,
      budgetPct: Int = SampleBudgetPct): DataFrame = {
    val cents = cachedIvfCentroids(spark, dir, k, normalized(spark, dir))
    import spark.implicits._
    val centDf = cents.toSeq.toDF("cid", "cvec")
    // ONE assignment pass (the only corpus-sized stage): the quota
    // frame and the ranked selection both derive from it
    val assign = assignCells(normalized(spark, dir), centDf)
      .localCheckpoint()
    val quotas = clusterQuotaFrame(assign, alpha, budgetPct)
    val w = Window.partitionBy("cell")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assign.withColumn("rk", row_number().over(w))
      .join(broadcast(quotas.select("cell", "quota")), "cell")
      .select(col("vec_id"), col("cell"),
        when(col("rk") <= col("quota"), lit(1L)).otherwise(lit(0L))
          .as("selected"))
  }

  /** Driver gate for [[clusterBalancedSample]] (hash-exact against
    * constant-1s): (1) every vector labeled exactly once; (2) each
    * cell's selected count is EXACTLY min(quota, size); (3) the
    * largest topic's share of the sample does not exceed its raw
    * share (concave reweighting flattens, never sharpens — one
    * integer-slack unit allowed for quota flooring). */
  def clusterBalancedSampleGate(spark: SparkSession, dir: String)
      : DataFrame = {
    val s = clusterBalancedSample(spark, dir,
      SampleK, SampleAlpha, SampleBudgetPct).cache()
    val n = Tables.embeddings(spark, dir).count()
    val once = s.count() == n &&
      s.select("vec_id").distinct().count() == n
    // independent quota recompute from the sample's own cell sizes
    // (faithful iff `once` holds, which is gated alongside)
    val got = s.groupBy("cell")
      .agg(sum("selected").as("sel"), count(lit(1)).as("sz"))
      .collect().map(r => (r.getInt(0),
        (r.getAs[Long]("sel"), r.getAs[Long]("sz")))).toMap
    val quotas = clusterQuotas(
      got.map { case (c, (_, sz)) => (c, sz) }.toArray.sortBy(_._1),
      SampleAlpha, SampleBudgetPct)
    val quotaExact = quotas.nonEmpty && quotas.forall {
      case (c, sz, quota) => got(c)._1 == math.min(quota, sz)
    }
    val totalSel = got.values.map(_._1).sum
    val (selMax, szMax) = got.values.maxBy(_._2)
    val flattened = selMax * n <= szMax * totalSel + n
    s.unpersist()
    import spark.implicits._
    Seq((if (once) 1 else 0, if (quotaExact) 1 else 0,
      if (flattened) 1 else 0))
      .toDF("labeled_once", "quota_exact", "max_topic_flattened")
  }

  val clusterBalancedSampleGateSql: String =
    """SELECT 1 AS labeled_once, 1 AS quota_exact,
      |       1 AS max_topic_flattened
      |FROM embeddings LIMIT 1""".stripMargin

  /** Deterministic pseudo-random unit hyperplanes (seeded, so plans are
    * reproducible across runs and engines). */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Occupancy-flat sign-LSH bit count: enough hyperplanes that the
    * expected bucket occupancy n/2^bits stays ≈ 32, floored at the
    * historical 6 so every provisioned gate SF (≤ 2k vectors) keeps
    * its exact pre-auto-tune output. Deterministic in n only. */
  def lshAutoBits(n: Long): Int =
    math.max(6, math.ceil(math.log(math.max(1L, n) / 32.0) /
      math.log(2.0)).toInt)

  /** Sign-LSH bucket id per vector: one bit per hyperplane (sign of the
    * projection), per table. Multiple independent tables trade memory
    * for recall: a pair is a candidate if it collides in ANY table.
    *
    * All numTables·bitsPerTable projections run in ONE codegen'd
    * expression over a single nested-array literal
    * ([[graft.functions.LshSignature]]): the old per-plane column
    * composition emitted thousands of literal expression nodes at the
    * auto-tuned bit counts and fell out of whole-stage codegen
    * (measured ~1 ms/row at the ×10 decade bench). Bucket ids are
    * bit-identical to the old composition (same dot order, same
    * `>= 0.0`, same bit packing — spec-asserted). */
  def lshBuckets(vectors: DataFrame, numTables: Int = 16,
      bitsPerTable: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val flat: Seq[Seq[Double]] = (0 until numTables)
      .flatMap(t => planes(bitsPerTable, dim, seed + t).map(_.toSeq))
    vectors.select(
      // loud, not silently degraded: a dim mismatch makes every
      // projection dot only the common prefix of vector and plane —
      // bucket collisions stop reflecting angles and recall decays
      // with nothing erroring (the guard is codegen'd, no extra pass)
      when(assert_true(size(col("vec")) === dim,
        lit(s"lshBuckets: hyperplanes are $dim-dim but a vector " +
          "differs — pass the corpus dimension")).isNull,
        col("vec_id")).as("vec_id"),
      col("vec"),
      posexplode(graft.functions.VectorFunctions.lshSignature(
        col("vec"), typedLit(flat), bitsPerTable)))
      .withColumnRenamed("pos", "table_id")
      .withColumnRenamed("col", "bucket")
  }

  /** Scale-path near-dup: sign-LSH candidate generation + exact cosine
    * verification. Returns only verified pairs (precision 1.0 vs the
    * exact variant; recall measured in OpsSpec).
    *
    * Shuffle discipline (benchmarked): the bucket self-join and the
    * dedup of candidate pairs move ONLY (table, bucket, vec_id) — never
    * the vectors. Vectors re-attach afterwards via two joins against
    * the (small, cached) corpus; at 100 TB those become shuffle joins
    * on vec_id but the candidate set is already LSH-pruned. Carrying
    * the 64-dim arrays through the pair shuffle instead was measured
    * 30× slower.
    *
    * Tuning: bitsPerTable must grow with log(corpus size) to keep
    * bucket occupancy flat — the default (0) self-tunes via
    * [[lshAutoBits]]. A FIXED bit count is the same quiet
    * degradation the fixed-cell-count note on
    * [[semanticDedupClusters]] documents: 2^bits buckets per table
    * means occupancy n/2^bits and a candidate join quadratic in it
    * (measured at the ×10 decade bench: 6 fixed bits ⇒ 312
    * vectors/bucket at 20k ⇒ 68.8 s, 31.9× the sf0.1 time; auto ⇒
    * 10 bits, occupancy flat). More bits cost per-table recall only
    * on BORDERLINE pairs (collision prob (1−θ/π)^bits); the
    * duplicate regime (cos ≥ 0.9, θ ≤ 26°) holds ≥ 0.97 recall
    * across 16 tables even at 11 bits. numTables buys recall. */
  def lshNearDupPairs(spark: SparkSession, dir: String, tau: Double = 0.4,
      numTables: Int = 16, bitsPerTable: Int = 0): DataFrame = {
    // cached: without a materialization boundary, CollapseProject inlines
    // the normalize() expression into every one of the numTables ×
    // bitsPerTable plane projections
    val corpus = normalized(spark, dir).cache()
    val bits = if (bitsPerTable > 0) bitsPerTable
      else lshAutoBits(corpus.count())
    // hyperplane dimension DERIVED from the data, never assumed: a
    // regenerated embedding table at another dim would otherwise
    // project against 64-dim planes' prefix (one 1-row job; the
    // corpus is cached and counted above anyway)
    val dim = corpus.select(size(col("vec"))).head().getInt(0)
    val buckets = lshBuckets(corpus, numTables, bits, dim)
      .select("vec_id", "table_id", "bucket")
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    // Re-attach vectors with NO join-strategy hint: AQE picks broadcast
    // when the corpus fits under the runtime broadcast threshold (test
    // scale) and falls back to a shuffle join on vec_id when it does
    // not (100 TB) — a hard-coded broadcast(corpus) would OOM the
    // driver at scale. ScaleSpec asserts the shuffle-join shape with
    // broadcast disabled.
    candidates
      .join(corpus.select(col("vec_id").as("vec_a"),
        col("vec").as("va")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"),
        col("vec").as("vb")), "vec_b")
      .where(dot(col("va"), col("vb")) >= tau)
      .select("vec_a", "vec_b")
  }
}
