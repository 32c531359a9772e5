package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-wide duplicated-SPAN detection and removal — substring-grain
  * exact dedup: find every maximal run of tokens that is covered by
  * some length-k token window occurring ≥ minCount times anywhere in
  * the corpus, and (optionally) cut those runs out of the text while
  * keeping the document. Document-grain dedup ([[Dedup]]) keeps one
  * copy of a duplicated DOCUMENT; this removes duplicated PASSAGES —
  * boilerplate headers, license blocks, templated paragraphs — that
  * ride inside otherwise-unique documents and that document- and
  * near-dup-grain passes structurally cannot see.
  *
  * Semantics follow the ExactSubstr procedure of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (ACL
  * 2022): a span is duplicated when it is at least k tokens long and
  * appears ≥ 2 times in the corpus (their single-machine
  * implementation builds a suffix array; the length-k-window
  * formulation here is the standard distributed re-expression — every
  * duplicated substring of length ≥ k is exactly the union of its
  * duplicated k-windows, so marking covered token positions and
  * merging overlapping windows reproduces the same maximal spans).
  *
  * Scale design:
  *  - The only corpus-sized shuffles are (fp, partial-count) for the
  *    duplicate test and (fp, doc_id, pos) for the cover join — text
  *    never leaves the scan stage. fp is xxhash64 of the window
  *    (8 bytes); the duplicate SET is defined by token equality, so
  *    any injective hash yields the same result and the hash never
  *    appears in the output — which is why the DuckDB oracle can
  *    verify these queries hash-exactly by grouping on the window
  *    STRING itself, no portability twin needed. (A 64-bit collision
  *    marks one extra window as duplicated; at n windows the expected
  *    number of colliding pairs is ~n²/2⁶⁵ — at 10⁹ windows ≈ 0.03.
  *    The despanned output degrades by deleting a real span's worth of
  *    tokens, it never corrupts text.)
  *  - The window groupBy partial-aggregates map-side; the cover join
  *    shuffles both sides by fp, and hot fps (corpus-wide boilerplate)
  *    are exactly the AQE skew-join case — no salting needed because
  *    the payload behind each fp is (doc_id, pos) pairs only.
  *  - Duplicated window starts → maximal spans is a gaps-and-islands
  *    window over START positions (one row per duplicated window, not
  *    per covered token — fixed-length intervals merge by a gap-≤-k
  *    test on sorted starts), partitioned BY DOCUMENT (never a global
  *    window): state per task is bounded by tokens-per-doc.
  *  - Text reassembly never shuffles tokens: the merged spans per doc
  *    (an array of (s, e) — a handful of intervals, not per-token
  *    positions) join back to `documents` by doc_id and the cut is a
  *    higher-order filter over the token array in place. Cost is
  *    O(tokens · spans) per doc; spans is small by construction
  *    (merged maximal intervals).
  *
  * Reference scope: the reference pipeline has no substring-grain
  * dedup; this extends the LLM-pipeline surface (SURVEY §7) alongside
  * [[Dedup]] (document grain) and [[Chunk]] (chunk grain).
  */
object Spans {

  /** Every length-k token window with its 0-based start position:
    * (doc_id, pos, fp). Docs shorter than k tokens produce none. The
    * fp projection sits BELOW the Generate in its own select — inlining
    * it next to the posexplode would re-run the hash once per output
    * row of a hoisted projection (the q_split_leakage lesson). */
  private def windowFps(docs: DataFrame, k: Int): DataFrame =
    docs
      // materialize the token array ONCE per row: referencing
      // split(text) inside the transform lambda re-tokenizes the whole
      // document per window (~tokens× redundant work; the measured 3.3 s
      // → 0.6 s fix at sf0.1). The alias is multi-referenced and
      // non-cheap, so CollapseProject leaves it in place.
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - k),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("col")).as("fp"))

  /** Maximal duplicated spans: (doc_id, span_start, span_tokens),
    * span_start 0-based in token coordinates. A span is the merge of
    * every overlapping length-k window whose fp occurs ≥ minCount
    * times corpus-wide (within-doc repeats count — a doc that repeats
    * its own paragraph is duplication too, per the paper). */
  def duplicatedSpansFor(docs: DataFrame, k: Int = 8,
      minCount: Int = 2): DataFrame = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    require(minCount >= 2, s"minCount < 2 would mark everything, got $minCount")
    val kg = windowFps(docs, k)
    // duplicated fps: fp-only frame; the count shuffles 8-byte keys
    // with map-side partials. kg is intentionally NOT cached: both
    // consumers re-derive it from the scan (two linear passes beat
    // materializing a corpus-sized explode at target scale).
    val dupFp = kg.groupBy("fp").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount).select("fp")
    // One row per duplicated WINDOW START — never per covered token
    // position (an explode(sequence(pos, pos+k-1)) would multiply the
    // shuffle k× and then need a distinct). Starts are unique per doc
    // (kg has one row per (doc_id, pos); dupFp is unique fps), and for
    // fixed-length windows interval merge degenerates to a gap test on
    // sorted starts: two windows at s₁ < s₂ cover contiguous tokens
    // iff s₂ − s₁ ≤ k, so a span breaks exactly where the gap exceeds
    // k. Both window functions share one (doc_id, pos) sort.
    val starts = kg.join(dupFp, "fp").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val break = when(col("pos") - lag("pos", 1).over(w) > k, 1)
      .otherwise(0)
    starts
      .withColumn("grp", sum(break).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).cast("long")
          .as("span_tokens"))
      .select("doc_id", "span_start", "span_tokens")
  }

  /** Cut every duplicated span out of the text, keeping the document:
    * (doc_id, clean_text, n_removed). Docs fully covered by spans keep
    * an empty clean_text (dropping them is [[Dedup]]'s job — this
    * operator's contract is span surgery, the caller decides document
    * fate). Reassembly joins kept tokens with single spaces — the
    * corpus token format ([[TextStats.wsTokens]]). Note the paper's
    * caveat applies: removal can create NEW adjacencies that were not
    * in the original corpus; downstream passes see the cleaned text. */
  def despanFor(docs: DataFrame, k: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = duplicatedSpansFor(docs, k, minCount)
      .groupBy("doc_id")
      .agg(collect_list(struct(
        col("span_start").as("s"),
        (col("span_start") + col("span_tokens") - 1).as("e"))).as("spans"))
    val inSpan = (i: Column, spans: Column) =>
      exists(spans, sp => i >= sp.getField("s") && i <= sp.getField("e"))
    docs.join(spans, Seq("doc_id"), "left")
      // same once-per-row tokenization discipline as [[windowFps]]
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        when(col("spans").isNull, col("text"))
          .otherwise(concat_ws(" ",
            filter(col("toks"),
              (t, i) => !inSpan(i.cast("long"), col("spans")))))
          .as("clean_text"),
        coalesce(aggregate(col("spans"), lit(0L),
          (acc, sp) => acc + (sp.getField("e") - sp.getField("s") + lit(1L))),
          lit(0L)).as("n_removed"))
  }

  /** Registered form of [[duplicatedSpansFor]] over `documents`. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    duplicatedSpansFor(Tables.documentsSpread(spark, dir))

  /** Registered form of [[despanFor]] over `documents`. */
  def despannedDocs(spark: SparkSession, dir: String): DataFrame =
    despanFor(Tables.documentsSpread(spark, dir))

  /** Oracle: the duplicate SET is token-equality — DuckDB groups on
    * the window string itself (no hash), so the compare is exact. */
  val dupSpansSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |kg AS (SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS g
      |       FROM t, UNNEST(range(len(toks) - 8 + 1)) AS u(i)
      |       WHERE len(toks) >= 8),
      |dup AS (SELECT g FROM kg GROUP BY g HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, pos + j AS p
      |        FROM kg JOIN dup USING (g), UNNEST(range(8)) AS w(j)),
      |isl AS (SELECT doc_id, p,
      |               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |        FROM cov)
      |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
      |       count(*) AS span_tokens
      |FROM isl GROUP BY doc_id, grp""".stripMargin

  val despannedDocsSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |kg AS (SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS g
      |       FROM t, UNNEST(range(len(toks) - 8 + 1)) AS u(i)
      |       WHERE len(toks) >= 8),
      |dup AS (SELECT g FROM kg GROUP BY g HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, pos + j AS p
      |        FROM kg JOIN dup USING (g), UNNEST(range(8)) AS w(j)),
      |pos AS (SELECT doc_id, i AS p, toks[CAST(i + 1 AS INT)] AS tok
      |        FROM t, UNNEST(range(len(toks))) AS u(i)),
      |kept AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
      |         FROM pos
      |         WHERE NOT EXISTS (SELECT 1 FROM cov
      |                           WHERE cov.doc_id = pos.doc_id AND cov.p = pos.p)
      |         GROUP BY doc_id),
      |rm AS (SELECT doc_id, count(*) AS n_rm FROM cov GROUP BY doc_id)
      |SELECT t.doc_id,
      |       CASE WHEN rm.doc_id IS NULL THEN t.text
      |            ELSE COALESCE(kept.clean_text, '') END AS clean_text,
      |       CAST(COALESCE(rm.n_rm, 0) AS BIGINT) AS n_removed
      |FROM t
      |LEFT JOIN kept ON kept.doc_id = t.doc_id
      |LEFT JOIN rm ON rm.doc_id = t.doc_id""".stripMargin
}
