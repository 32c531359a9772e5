package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Shard packing by cumulative token budget — the step that turns a
  * cleaned corpus into fixed-budget training shards ("pack documents
  * in doc_id order into shards of ≤ N tokens").
  *
  * The naive formulation is a running sum over a GLOBAL ORDER BY —
  * `Window.orderBy(...)` with no partitioning — which Spark executes as
  * a single task holding the whole corpus: correct at test scale,
  * impossible at 100 TB. This is the classic distributed prefix-sum
  * instead, two passes and fully parallel:
  *
  *  1. Range-partition by the order key and sort within partitions —
  *     the global order becomes (partition asc, row-in-partition asc)
  *     with no global sort task.
  *  2. Aggregate one total per partition (bounded by partition count),
  *     collect, and prefix-sum them on the driver into per-partition
  *     offsets — O(#partitions), not O(rows).
  *  3. Per-partition window cumsum (parallel: each partition windows
  *     independently) + the broadcast offset = the exact global
  *     running total.
  *
  * The output depends only on the global order and the weights — not
  * on partition boundaries — so results are cluster-size-invariant and
  * hash-match a single-threaded SQL oracle.
  */
object Pack {

  /** Size-aware partition count for the prefix-sum range pass: the
    * optimizer's size estimate of the slim (key, weight) projection,
    * one task per ~64 MB, floored at `spark.sql.shuffle.partitions`.
    * A fixed default (the old 32) is the same silent-degradation knob
    * the IVF cell count had: at 100 TB it means ~3 TB per
    * `sortWithinPartitions` task. The result is partition-count-
    * invariant by construction (asserted in PipelineOpsSpec), so this
    * only sizes tasks, never changes answers. */
  private def autoParts(slim: DataFrame): Int = {
    val shuffleParts =
      slim.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = slim.queryExecution.optimizedPlan.stats.sizeInBytes
    // Stats-less inputs (createDataFrame over an RDD, some DSv2
    // relations) report spark.sql.defaultSizeInBytes = Long.MaxValue at
    // the LEAF — trusting the derived estimate (projections scale the
    // leaf size by row-width ratio, so the top-level number looks
    // "merely" exabyte-huge rather than exactly MaxValue) would size a
    // 4M-partition range shuffle, a 4M-entry scanLeft, and a 4M-row
    // driver collect on a tiny input. Any stats-less leaf ⇒ the
    // estimate is fiction: fall back to the shuffle-partition count
    // (correctness is partition-count-invariant, so this only affects
    // task sizing).
    val defaultSize = BigInt(slim.sparkSession.conf
      .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString))
    val leaves = slim.queryExecution.optimizedPlan.collectLeaves()
    val statsless = leaves.exists(_.stats.sizeInBytes >= defaultSize)
    if (statsless) shuffleParts
    else {
      // Joins with no column stats estimate MULTIPLICATIVELY — a
      // doc-grain key frame derived through two joins reported 2.4 TB
      // at sf1 (true size ~2 MB), sizing a 36k-partition range pass
      // whose partitioner bounds (36k strings) serialized into every
      // task: 609 s of pure closure deserialization. The inputs here
      // are always slim key frames built by projection/aggregation
      // over the scans, so the SUM OF LEAF SIZES bounds the true
      // volume — clamp the derived estimate to it.
      //
      // CONTRACT (not detected): the clamp assumes bounded fan-out —
      // a caller whose frame explodes far past its inputs must pass
      // an explicit numParts. The tempting "skip the clamp when the
      // plan contains a Generate" guard was tried and REVERTED: the
      // ppl-bucket key frame carries both a small bounded explode AND
      // the multiplicative join fiction, so the guard re-opened the
      // exact 147x regression the clamp was built to fix (sf1
      // measured; a Generate node does not tell you which effect
      // dominates the estimate). Bounded-explode frames stay correct
      // under the clamp because correctness is partition-count-
      // invariant — the only risk is task sizing, and the shuffle-
      // partition floor below keeps that sane.
      val leafSum = leaves.map(_.stats.sizeInBytes).sum
      val bySize = (bytes.min(leafSum) / (64L << 20))
        .min(BigInt(4 << 20)).toInt + 1
      math.max(shuffleParts, bySize)
    }
  }

  /** Global running sum + shard assignment. `orderCol` must be a unique
    * key (ties across a partition boundary would make the order — and
    * any global cumsum — ill-defined). Shard id = exclusive prefix sum
    * DIV budget: a document starts a new shard once the previous ones
    * have consumed the budget. `numParts` ≤ 0 (the default) derives
    * the range-pass width from the input size estimate. */
  def packIntoShards(df: DataFrame, orderCol: String, weight: Column,
      budget: Long, numParts: Int = 0): DataFrame = {
    val slim = df.select(col(orderCol), weight.cast("long").as("w"))
    val parts = if (numParts > 0) numParts else autoParts(slim)
    val weighted = slim
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("pid", spark_partition_id())
      // bounded cache: (key, weight, pid) — pins the partitioning so
      // pass 2 and pass 3 see identical pids
      .cache()
    val totals = weighted.groupBy("pid").agg(sum("w").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
    // Offsets ride in as a broadcast-joined frame, NOT a map literal:
    // a plan literal with one entry per partition stops being a
    // constant at a size-derived partition count (10⁵⁺ at 100 TB) —
    // the same codegen-blowup trap as literal IVF centroids.
    import slim.sparkSession.implicits._
    val offsetsDf = (0 until parts).map(p => (p, offsets(p)))
      .toDF("pid", "p_off")
    val w = Window.partitionBy("pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weighted
      .join(broadcast(offsetsDf), "pid")
      .withColumn("cum_tokens", sum(col("w")).over(w) + col("p_off"))
      .withColumn("shard_id", expr(s"(cum_tokens - w) DIV $budget"))
      .drop("pid", "p_off")
  }

  /** Pack the documents table into 4096-token shards in doc_id order —
    * the oracle query (whitespace token weights match the oracle's
    * string_split exactly). */
  def packDocs(spark: SparkSession, dir: String): DataFrame =
    packIntoShards(Tables.documents(spark, dir), "doc_id",
      size(split(col("text"), " ")), budget = 4096L)

  /** The pack pipeline as a composable CTE body ending in
    * `ps(doc_id, w, cum_tokens, shard_id)` — consumers compose it
    * (the r12 derive-by-composition rule; the payload/manifest
    * oracles were the last `.replace`-derived statements). */
  private[ops] val packCteBody: String =
    """w AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, w,
      |         CAST(SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |              AS BIGINT) AS cum_tokens
      |  FROM w),
      |ps AS (
      |  SELECT doc_id, w, cum_tokens,
      |         (cum_tokens - w) // 4096 AS shard_id
      |  FROM c)""".stripMargin

  val packDocsSql: String =
    s"WITH $packCteBody\nSELECT doc_id, w, cum_tokens, shard_id FROM ps"

  /** Stable contiguous row ids in key order — the scalable form of
    * zipWithIndex / ROW_NUMBER-over-everything (both of which either
    * funnel through one task or depend on partition layout):
    * weight-1 prefix sums ARE 1-based global positions, computed by
    * the same two-pass machinery, cluster-size-invariant. The id a
    * training pipeline stamps on examples before sharding. */
  def assignStableIds(df: DataFrame, orderCol: String,
      numParts: Int = 0): DataFrame =
    packIntoShards(df, orderCol, lit(1L), budget = Long.MaxValue, numParts)
      .select(col(orderCol), col("cum_tokens").as("row_idx"))

  def docStableIds(spark: SparkSession, dir: String): DataFrame =
    assignStableIds(Tables.documents(spark, dir), "doc_id")

  val docStableIdsSql: String =
    """SELECT doc_id,
      |       ROW_NUMBER() OVER (ORDER BY doc_id) AS row_idx
      |FROM documents""".stripMargin

  /** Deterministic global corpus shuffle + shard assignment — the
    * "shuffle the data once before training" step. Ordering by a
    * content-free seeded hash of the key gives a reproducible
    * pseudo-random permutation with no `rand()` (partition-order
    * dependent) and no driver-side state; the position comes from the
    * same distributed prefix-sum machinery as [[assignStableIds]], so
    * it is cluster-size-invariant and never funnels through one task.
    * The shard is a hash bucket (md5 low bits, the Mix.contentBucket
    * pattern) — stable under re-runs and independent of the position.
    * md5 (not xxhash64) keeps the whole thing engine-portable, hence
    * hash-oracled; the cost difference is irrelevant next to the scan.
    *
    * The hash-ordered sort key carries doc_id as a suffix (hash first
    * ⇒ order is by hash; suffix ⇒ unique even on a hash collision), and
    * doc_id is parsed back out afterwards rather than re-joined — the
    * prefix-sum shuffle stays (key, weight)-slim and no second join
    * shuffle appears.
    */
  def corpusShuffle(spark: SparkSession, dir: String, seed: Int = 0,
      nShards: Int = 8): DataFrame = {
    val keyed = Tables.documents(spark, dir).select(
      concat(md5(concat(lit(s"graft:$seed:"), col("doc_id").cast("string"))),
        lit(":"), col("doc_id").cast("string")).as("k"))
    assignStableIds(keyed, "k")
      .select(
        element_at(split(col("k"), ":"), 2).cast("long").as("doc_id"),
        col("row_idx").as("shuffle_pos"),
        (conv(substring(element_at(split(col("k"), ":"), 1), 25, 8), 16, 10)
          .cast("long") % nShards).as("shard"))
  }

  val corpusShuffleSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         md5('graft:0:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents)
      |SELECT doc_id,
      |       ROW_NUMBER() OVER (ORDER BY h || ':' || CAST(doc_id AS VARCHAR))
      |         AS shuffle_pos,
      |       CAST(concat('0x', substr(h, 25, 8)) AS BIGINT) % 8 AS shard
      |FROM h""".stripMargin

  /** Per-shard manifest: member count + token total per shard — what a
    * training loader reads. Every shard except possibly the last holds
    * > budget - max_doc_tokens and ≤ budget + last-doc overhang. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    packDocs(spark, dir)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("shard_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))

  /** Materialized shard payloads — the training sequences themselves:
    * every shard's member documents concatenated in doc_id order into
    * one text blob (what a loader feeds the tokenizer), plus the count.
    * One key shuffle on shard_id after the packing pass; per-group
    * state is the shard's own documents (budget-bounded by
    * construction, so collect_list cannot blow up a group). Order
    * inside the group comes from sorting the collected (doc_id, text)
    * structs — deterministic, never collect_list arrival order. */
  def packedPayloads(spark: SparkSession, dir: String): DataFrame =
    packDocs(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "text"), "doc_id")
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text"))).as("payload"))

  val packedPayloadsSql: String =
    s"""WITH $packCteBody
       |SELECT shard_id, COUNT(*) AS n_docs,
       |       string_agg(d.text, ' ' ORDER BY ps.doc_id) AS payload
       |FROM ps JOIN documents d ON ps.doc_id = d.doc_id
       |GROUP BY shard_id""".stripMargin

  val shardManifestSql: String =
    s"""WITH $packCteBody
       |SELECT shard_id, COUNT(*) AS n_docs,
       |       CAST(SUM(w) AS BIGINT) AS shard_tokens,
       |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM ps GROUP BY shard_id""".stripMargin

  /** SEQUENCE packing — the causal-LM layout step shard packing is
    * not: concatenate the corpus token stream in key order and cut it
    * every `seqLen` tokens, SPLITTING documents across cuts. Each
    * output row is one (document × sequence) span: where the doc's
    * tokens land in the sequence (`seq_off`), where the span starts
    * inside the doc (`doc_off`), and its length — exactly the
    * manifest a packed-attention loader needs to build position ids
    * and cross-document attention masks.
    *
    * Scale shape: global token offsets come from the SAME two-pass
    * distributed prefix sum as [[packIntoShards]] (no global window);
    * after that, everything is per-row integer arithmetic plus one
    * explode whose fan-out is ⌈doc_tokens/seqLen⌉ + 1 — total output
    * rows ≈ n_docs + total_tokens/seqLen, linear. All integers, so
    * hash-exact vs the oracle's window cumsum. */
  def packSequences(df: DataFrame, orderCol: String, weight: Column,
      seqLen: Long): DataFrame =
    packIntoShards(df, orderCol, weight, budget = Long.MaxValue)
      .where(col("w") > 0)
      .withColumn("start_off", col("cum_tokens") - col("w"))
      .withColumn("seq_id", explode(sequence(
        expr(s"start_off div $seqLen"),
        expr(s"(cum_tokens - 1) div $seqLen"))))
      .select(col(orderCol), col("seq_id"),
        (greatest(col("start_off"), col("seq_id") * seqLen) -
          col("seq_id") * seqLen).as("seq_off"),
        (greatest(col("start_off"), col("seq_id") * seqLen) -
          col("start_off")).as("doc_off"),
        (least(col("cum_tokens"), (col("seq_id") + 1) * seqLen) -
          greatest(col("start_off"), col("seq_id") * seqLen)).as("n_toks"),
        col("w").as("doc_tokens"))

  /** Documents → 512-token training sequences (whitespace token
    * weights, doc_id order — the oracle query). */
  def docSequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), "doc_id",
      size(split(col("text"), " ")), seqLen = 512L)

  val docSequencesSql: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, w,
      |         CAST(SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |              AS BIGINT) AS cum
      |  FROM w),
      |s AS (SELECT doc_id, w, cum - w AS s0, cum FROM c WHERE w > 0),
      |x AS (
      |  SELECT doc_id, w, s0, cum, CAST(q AS BIGINT) AS seq_id
      |  FROM s, UNNEST(range(s0 // 512, (cum - 1) // 512 + 1)) AS g(q))
      |SELECT doc_id, seq_id,
      |       CAST(GREATEST(s0, seq_id * 512) - seq_id * 512 AS BIGINT)
      |         AS seq_off,
      |       CAST(GREATEST(s0, seq_id * 512) - s0 AS BIGINT) AS doc_off,
      |       CAST(LEAST(cum, (seq_id + 1) * 512)
      |            - GREATEST(s0, seq_id * 512) AS BIGINT) AS n_toks,
      |       w AS doc_tokens
      |FROM x""".stripMargin

  /** Per-sequence manifest: span count, fill (== seqLen everywhere but
    * the tail), and how many spans are document FRAGMENTS (a doc cut
    * by a sequence boundary) — the packing-efficiency report. One
    * seq_id partial-agg shuffle over the span frame. */
  def sequenceManifest(spark: SparkSession, dir: String): DataFrame =
    docSequences(spark, dir)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_spans"),
        sum("n_toks").cast("long").as("seq_tokens"),
        sum((col("n_toks") < col("doc_tokens")).cast("long"))
          .as("n_fragments"))

  val sequenceManifestSql: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, w,
      |         CAST(SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |              AS BIGINT) AS cum
      |  FROM w),
      |s AS (SELECT doc_id, w, cum - w AS s0, cum FROM c WHERE w > 0),
      |x AS (
      |  SELECT doc_id, w, s0, cum, CAST(q AS BIGINT) AS seq_id
      |  FROM s, UNNEST(range(s0 // 512, (cum - 1) // 512 + 1)) AS g(q))
      |SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |       CAST(SUM(LEAST(cum, (seq_id + 1) * 512)
      |                - GREATEST(s0, seq_id * 512)) AS BIGINT) AS seq_tokens,
      |       CAST(SUM(CASE WHEN LEAST(cum, (seq_id + 1) * 512)
      |                          - GREATEST(s0, seq_id * 512) < w
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_fragments
      |FROM x GROUP BY seq_id""".stripMargin

  /** Length-bucketed, token-capped BATCHING — the dynamic-batching
    * manifest for variable-length training (pad-to-max within batch):
    * whole documents grouped into batches whose token totals are
    * capacity-quantized at `cap`, restricted to power-of-two length
    * buckets so in-batch padding waste is bounded by 2× (pad-to-max
    * inside a bucket at most doubles the shortest member). The
    * complement of [[packSequences]]: packing SPLITS docs to fill
    * fixed sequences; batching keeps docs WHOLE and bounds the batch.
    *
    * Semantics (engine-portable, hash-oracled): bucket = bit length
    * of the whitespace token count (the [[Profile.lengthHistogram]]
    * integer form); in-bucket order = seeded md5 of doc_id (the
    * [[corpusShuffle]] decorrelation discipline); batch_id = exclusive
    * per-bucket running token sum DIV cap — the same quantized-cumsum
    * rule as [[packIntoShards]], so a batch may overhang `cap` by less
    * than one document, never more.
    *
    * Scale shape: ONE global prefix sum over the bucket-contiguous
    * composite key `bucket:md5:doc_id` (buckets are contiguous in
    * that order, so the per-bucket cumsum = global cumsum − bucket
    * start). Bucket starts come from a ≤64-row aggregate broadcast
    * back — there is NO per-bucket window (a bucket is a constant
    * fraction of the corpus; `PARTITION BY bucket` would funnel it
    * through one task). */
  def lengthBucketBatches(spark: SparkSession, dir: String,
      cap: Long = 2048L, seed: Int = 0): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .select(concat(
        lpad(length(bin(col("n_toks"))).cast("string"), 2, "0"),
        lit(":"),
        md5(concat(lit(s"graft:batch:$seed:"), col("doc_id").cast("string"))),
        lit(":"),
        // 20 chars fits EVERY Long (19 digits + sign): Spark's lpad
        // TRUNCATES longer inputs, so a narrower pad would silently
        // corrupt ids ≥ 10^12 in the output and could collide sort
        // keys (snapshot-prefixed id schemes reach 13+ digits)
        lpad(col("doc_id").cast("string"), 20, "0")).as("bk"),
        col("n_toks"))
    val cum = packIntoShards(keyed, "bk", col("n_toks"),
        budget = Long.MaxValue)
      .select(col("bk"), col("w"), col("cum_tokens"))
      .withColumn("bucket", substring(col("bk"), 1, 2).cast("int"))
    val bucketStarts = cum.groupBy("bucket")
      .agg(min(col("cum_tokens") - col("w")).as("b_start"))
    cum.join(broadcast(bucketStarts), "bucket")
      .select(
        substring(col("bk"), 37, 20).cast("long").as("doc_id"),
        col("bucket"),
        expr(s"(cum_tokens - w - b_start) DIV $cap").as("batch_id"),
        col("w").as("n_toks"))
  }

  val lengthBucketBatchesSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
      |         CAST(length(bin(len(string_split(text, ' ')))) AS INT)
      |           AS bucket,
      |         md5('graft:batch:0:' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, bucket, n_toks,
      |         CAST(SUM(n_toks) OVER (PARTITION BY bucket
      |              ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
      |              AS BIGINT) AS cum
      |  FROM w)
      |SELECT doc_id, bucket, (cum - n_toks) // 2048 AS batch_id, n_toks
      |FROM c""".stripMargin

  /** Per-batch manifest: member count, token total, and the
    * pad-to-max cost (`padded_tokens` = n_docs × longest member) —
    * the padding-efficiency report a training owner reads to pick
    * `cap` and the bucket grain. One (bucket, batch_id) partial-agg
    * shuffle over the batch frame. */
  def batchManifest(spark: SparkSession, dir: String,
      cap: Long = 2048L): DataFrame =
    lengthBucketBatches(spark, dir, cap)
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("batch_tokens"),
        (max("n_toks") * count(lit(1))).as("padded_tokens"))

  val batchManifestSql: String =
    s"""WITH b AS ($lengthBucketBatchesSql)
       |SELECT bucket, batch_id, COUNT(*) AS n_docs,
       |       CAST(SUM(n_toks) AS BIGINT) AS batch_tokens,
       |       CAST(MAX(n_toks) * COUNT(*) AS BIGINT) AS padded_tokens
       |FROM b GROUP BY 1, 2""".stripMargin
}
