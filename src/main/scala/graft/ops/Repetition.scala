package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Repetition / template-spam signals — the classic "Gopher rules"
  * family of pre-training quality filters: how much of a document is
  * the same token or the same bigram repeated. Boilerplate, keyword
  * stuffing, and generation loops all light up on these long before a
  * model sees them.
  *
  * Per document:
  *  - `distinct_token_ratio` — distinct tokens / total tokens (low =
  *    repetitive);
  *  - `top_token_frac` — occurrences of the single most frequent token
  *    / total tokens;
  *  - `dup_bigram_frac` — fraction of bigram OCCURRENCES that are
  *    repeats of an earlier bigram (1 − distinct/total);
  *  - `top_bigram_frac` — occurrences of the most frequent bigram /
  *    total bigrams.
  *
  * Shape at 100 TB: ONE scan of the text — unigrams and bigrams are
  * emitted from the same projection as a single (kind, gram) struct
  * stream, so the corpus (the dominant cost at scale) is read once,
  * not once per n-gram order. Then two map-side-combined key
  * shuffles: (doc_id, kind, gram) counts, then doc-level rollup with
  * per-kind conditional aggregates. Nothing pairwise, nothing
  * quadratic; shuffle volume is bounded by the exploded gram stream
  * and reduces to doc-level immediately. The bigram array is built
  * with a single O(len) `transform(sequence)` over O(1) `element_at`
  * lookups — NOT the O(len²) slice-per-position shape that bit the
  * winnowing op (see TextStats.winnowingFor).
  *
  * All ratios are exact-int / exact-int single IEEE divisions —
  * bit-deterministic across engines and partitionings, hence
  * hash-oracled against DuckDB.
  */
object Repetition {

  /** Per-document repetition signals for any (doc_id, text) frame. */
  def signalsFor(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), TextStats.wsTokens(col("text")).as("toks"))

    // ONE exploded (kind, gram) stream per document: kind 0 =
    // unigrams, kind 1 = bigrams built by O(1) element_at index
    // arithmetic (the trailing position emits null and is filtered —
    // `sequence(1, size-1)` can't be used directly because Spark's
    // sequence steps BACKWARDS when size==1 makes start > stop).
    // Chained single-level lambdas only: no nested HOFs (those run
    // interpreted and re-evaluate per outer element).
    val grams = docs.select(col("doc_id"),
      explode(concat(
        expr("transform(toks, t -> named_struct('kind', 0, 'g', t))"),
        expr("filter(transform(sequence(1, size(toks)), i -> " +
          "IF(i < size(toks), named_struct('kind', 1, 'g', " +
          "concat(element_at(toks, i), ' ', element_at(toks, i + 1))), " +
          "CAST(null AS struct<kind: int, g: string>))), " +
          "s -> s IS NOT NULL)"))).as("gk"))
      .select(col("doc_id"),
        col("gk.kind").as("kind"), col("gk.g").as("g"))

    // Shuffle 1: (doc_id, kind, gram) occurrence counts, map-side
    // combined. Shuffle 2: doc-level rollup, both kinds in one pass
    // via conditional aggregates (count counts non-null args only).
    val stats = grams
      .groupBy(col("doc_id"), col("kind"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(when(col("kind") === 0, col("c"))).as("n_tokens"),
        count(when(col("kind") === 0, lit(1))).as("n_distinct_tokens"),
        max(when(col("kind") === 0, col("c"))).as("top_token_n"),
        sum(when(col("kind") === 1, col("c"))).as("n_bigrams"),
        count(when(col("kind") === 1, lit(1))).as("n_distinct_bigrams"),
        max(when(col("kind") === 1, col("c"))).as("top_bigram_n"))

    stats
      .na.fill(0L, Seq("n_bigrams", "n_distinct_bigrams", "top_bigram_n"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("top_token_n"), col("n_bigrams"), col("n_distinct_bigrams"),
        col("top_bigram_n"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens"))
          .as("distinct_token_ratio"),
        (col("top_token_n").cast("double") / col("n_tokens"))
          .as("top_token_frac"),
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams")).otherwise(lit(0.0))
          .as("dup_bigram_frac"),
        when(col("n_bigrams") > 0,
          col("top_bigram_n").cast("double") / col("n_bigrams"))
          .otherwise(lit(0.0))
          .as("top_bigram_frac"))
  }

  /** Per-document repetition signal table over `documents`. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    signalsFor(Tables.documentsSpread(spark, dir))

  val repetitionSignalsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tok AS (SELECT doc_id, u.tk FROM t, UNNEST(toks) AS u(tk)),
      |tc AS (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |ts AS (SELECT doc_id, COUNT(*) AS n_distinct_tokens,
      |              CAST(SUM(c) AS BIGINT) AS n_tokens,
      |              CAST(MAX(c) AS BIGINT) AS top_token_n
      |       FROM tc GROUP BY doc_id),
      |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
      |       FROM t, UNNEST(range(1, len(toks))) AS u(i)
      |       WHERE len(toks) >= 2),
      |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |bs AS (SELECT doc_id, COUNT(*) AS n_distinct_bigrams,
      |              CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |              CAST(MAX(c) AS BIGINT) AS top_bigram_n
      |       FROM bc GROUP BY doc_id)
      |SELECT ts.doc_id, ts.n_tokens, ts.n_distinct_tokens, ts.top_token_n,
      |       COALESCE(bs.n_bigrams, 0) AS n_bigrams,
      |       COALESCE(bs.n_distinct_bigrams, 0) AS n_distinct_bigrams,
      |       COALESCE(bs.top_bigram_n, 0) AS top_bigram_n,
      |       CAST(ts.n_distinct_tokens AS DOUBLE) / ts.n_tokens
      |         AS distinct_token_ratio,
      |       CAST(ts.top_token_n AS DOUBLE) / ts.n_tokens AS top_token_frac,
      |       CASE WHEN COALESCE(bs.n_bigrams, 0) > 0
      |            THEN CAST(bs.n_bigrams - bs.n_distinct_bigrams AS DOUBLE)
      |                   / bs.n_bigrams
      |            ELSE 0.0 END AS dup_bigram_frac,
      |       CASE WHEN COALESCE(bs.n_bigrams, 0) > 0
      |            THEN CAST(bs.top_bigram_n AS DOUBLE) / bs.n_bigrams
      |            ELSE 0.0 END AS top_bigram_frac
      |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id""".stripMargin
}
