package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** BPE tokenizer TRAINING and encoding over the corpus — the
  * vocabulary-learning step every LM pretraining pipeline runs before
  * it can count a single token budget (Sennrich et al., ACL 2016; the
  * HuggingFace `tokenizers` trainer is the operational model).
  *
  * Scale design — the classic trainer shape, distributed:
  *  - The CORPUS-scale work is ONE pass: explode whitespace words,
  *    groupBy word → `(word, wc)`. Partial aggregation absorbs the
  *    token explosion map-side; the shuffle carries one row per
  *    DISTINCT word. Everything after operates at vocabulary grain
  *    (10⁴-10⁷ rows at 100 TB — thousands of times smaller than the
  *    corpus), which is exactly why reference trainers collect word
  *    counts before the merge loop. We keep the word table
  *    DISTRIBUTED (no driver collect): each merge round is one
  *    vocabulary-sized partial-agg shuffle + a 1-row driver take.
  *  - Merge application is a codegen string op: symbols are joined on
  *    a `` separator and a merge of pair (l, r) is
  *    `replace(syms, "l␁r", "lr")` — Spark's `StringReplace` scans
  *    left-to-right non-overlapping, which IS the BPE leftmost-greedy
  *    merge rule ("aaa" + merge (a,a) → ["aa", "a"]).
  *  - ENCODING also runs at vocabulary grain: each distinct word is
  *    encoded once (a chain of nMerges `replace` nodes, all codegen),
  *    then per-doc token counts come from joining the (doc, word, tf)
  *    frequencies to the word→n_tokens table — the corpus text is
  *    never re-scanned per merge. The word table broadcasts at test
  *    scale; at a 10⁷-word production vocabulary AQE picks the
  *    shuffle join and the join key is the word itself, already the
  *    tf table's natural key.
  *
  * Determinism: pair counts are integers; the merge argmax tie-breaks
  * (count desc, left asc, right asc); `replace` is exact — the whole
  * trainer is a pure function of the corpus, so the spec can demand
  * EXACT merge-sequence equality with an in-memory reference trainer.
  *
  * Invariant: corpus text is whitespace-delimited `[a-z0-9]` words
  * (no `` anywhere), so the separator never collides. */
object Tokenize {

  /** Symbol separator inside an encoded word. */
  private val SEP = ""

  /** Distinct whitespace words with corpus counts — the one
    * corpus-scale pass (one partial-agg shuffle keyed by word). */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Corpus-wide adjacent character-pair counts weighted by word
    * frequency — round 0 of BPE training, and the oracle-able face of
    * the trainer (DuckDB reproduces it exactly). Pairs are generated
    * positionally (`substring(word, i, 1)`), so no split/explode of
    * the corpus text beyond the word-count pass. */
  def bpePairStats(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir))
      .where(length(col("word")) >= 2)
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(substring(col("word"), col("i"), lit(1)).as("left_sym"),
        substring(col("word"), col("i") + 1, lit(1)).as("right_sym"),
        col("wc"))
      .groupBy("left_sym", "right_sym")
      .agg(sum("wc").cast("long").as("pair_count"))

  val bpePairStatsSql: String =
    """WITH w AS (
      |  SELECT t.term AS word, COUNT(*) AS wc
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
      |  WHERE length(t.term) > 0 GROUP BY 1),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
      |         substr(word, CAST(i AS INT) + 1, 1) AS right_sym, wc
      |  FROM w, UNNEST(range(1, length(word))) AS r(i)
      |  WHERE length(word) >= 2)
      |SELECT left_sym, right_sym, CAST(SUM(wc) AS BIGINT) AS pair_count
      |FROM p GROUP BY 1, 2""".stripMargin

  /** Adjacent symbol-pair counts of the CURRENT `(syms, wc)` table
    * (vocabulary grain — runs once per merge round). */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("wc"), split(col("syms"), SEP).as("a"))
      .where(size(col("a")) >= 2)
      .select(col("wc"),
        explode(sequence(lit(0), size(col("a")) - 2)).as("i"),
        col("a"))
      .select(element_at(col("a"), col("i") + 1).as("l"),
        element_at(col("a"), col("i") + 2).as("r"), col("wc"))
      .groupBy("l", "r").agg(sum("wc").as("pair_count"))

  /** Train `nMerges` BPE merges. Returns (rank, left_sym, right_sym,
    * pair_count) in training order. The merge loop runs `nMerges`
    * vocabulary-sized jobs (pair partial-agg + 1-row take); the word
    * table is re-checkpointed each round so lineage stays O(1). Stops
    * early when every word is a single symbol. */
  def bpeTrainMerges(spark: SparkSession, dir: String,
      nMerges: Int = 16): Seq[(Int, String, String, Long)] = {
    var words = wordCounts(Tables.documents(spark, dir))
      .select(array_join(
          filter(split(col("word"), ""), s => length(s) > 0),
          SEP).as("syms"),
        col("wc"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = words.withColumn("syms",
          org.apache.spark.sql.functions.replace(
            col("syms"), lit(l + SEP + r), lit(l + r)))
          .localCheckpoint()
        org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(words)
        words = next
        rank += 1
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(words)
    merges.toSeq
  }

  /** The trained merge table as a DataFrame — memoized per (session,
    * dir): the trainer is deterministic, so every gate in one session
    * rides one training run. Bounded: nMerges rows. */
  def bpeMerges(spark: SparkSession, dir: String,
      nMerges: Int = 16): DataFrame =
    Scratch.memo(spark, s"bpe-merges:$dir:$nMerges") {
      import spark.implicits._
      bpeTrainMerges(spark, dir, nMerges)
        .toDF("rank", "left_sym", "right_sym", "pair_count")
    }

  /** Gate for the (non-SQL-expressible) iterative trainer. The first
    * three columns are a TRUE differential test — DuckDB recomputes
    * merge #1 as the argmax of the pair stats from scratch; the last
    * is a self-gate (best-pair counts are non-increasing over ranks:
    * a merge with count c can only create or keep pairs with count
    * ≤ c, so a violation means the loop recounted wrong). */
  def bpeMergesGate(spark: SparkSession, dir: String): DataFrame = {
    val m = bpeMerges(spark, dir)
    val first = m.where(col("rank") === 1)
      .select(col("left_sym").as("first_left"),
        col("right_sym").as("first_right"),
        col("pair_count").as("first_count"))
    val mono = m.as("a").join(m.as("b"),
        col("a.rank") + 1 === col("b.rank"))
      .agg(min((col("a.pair_count") >= col("b.pair_count")).cast("int"))
        .as("counts_nonincreasing"))
    first.crossJoin(mono)
  }

  val bpeMergesGateSql: String =
    """WITH w AS (
      |  SELECT t.term AS word, COUNT(*) AS wc
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
      |  WHERE length(t.term) > 0 GROUP BY 1),
      |p AS (
      |  SELECT substr(word, CAST(i AS INT), 1) AS l,
      |         substr(word, CAST(i AS INT) + 1, 1) AS r, wc
      |  FROM w, UNNEST(range(1, length(word))) AS r(i)
      |  WHERE length(word) >= 2),
      |s AS (SELECT l, r, CAST(SUM(wc) AS BIGINT) AS pair_count
      |      FROM p GROUP BY 1, 2)
      |SELECT l AS first_left, r AS first_right,
      |       pair_count AS first_count, 1 AS counts_nonincreasing
      |FROM s ORDER BY pair_count DESC, l, r LIMIT 1""".stripMargin

  /** Encoded distinct words: (word, wc, encoded, n_tokens). The merge
    * chain is nMerges nested codegen `replace` nodes applied ONCE per
    * distinct word. */
  private def encodedWords(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir).orderBy("rank")
      .select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val chars = array_join(
      filter(split(col("word"), ""), s => length(s) > 0), SEP)
    val encoded = merges.foldLeft(chars: Column) { case (acc, (l, r)) =>
      org.apache.spark.sql.functions.replace(
        acc, lit(l + SEP + r), lit(l + r))
    }
    wordCounts(Tables.documents(spark, dir))
      .withColumn("encoded", encoded)
      .withColumn("n_tokens", size(split(col("encoded"), SEP)))
  }

  /** Per-document BPE token pricing: whitespace tokens, BPE tokens,
    * chars — the tokens-per-doc accounting a budget-mixed pretraining
    * run needs, WITHOUT re-scanning text per merge: distinct words
    * encode once, then one broadcast join onto the (doc, word, tf)
    * frequencies and one doc_id partial-agg shuffle. */
  def bpeEncodeCounts(spark: SparkSession, dir: String): DataFrame = {
    val perWord = encodedWords(spark, dir)
      .select(col("word").as("term"), col("n_tokens"),
        length(col("word")).as("n_chars_w"))
    Terms.termFrequencies(Tables.documents(spark, dir))
      .join(broadcast(perWord), "term")
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens_ws"),
        sum(col("tf") * col("n_tokens")).cast("long").as("n_tokens_bpe"),
        sum(col("tf") * col("n_chars_w")).cast("long").as("n_chars_words"))
  }

  /** Encode gate. `total_ws` / `total_chars` are TRUE differential
    * columns (DuckDB recomputes both from the raw text); `bounds_ok`
    * (ws ≤ bpe ≤ chars for EVERY doc — merges only ever shrink the
    * char segmentation and can never go below one token per word) and
    * `decode_ok` (stripping separators from every encoded distinct
    * word reproduces the word exactly — encoding is a segmentation,
    * never a rewrite) are self-gates the constants pin. */
  def bpeEncodeGate(spark: SparkSession, dir: String): DataFrame = {
    val counts = bpeEncodeCounts(spark, dir)
    val totals = counts.agg(
      sum("n_tokens_ws").cast("long").as("total_ws"),
      sum("n_chars_words").cast("long").as("total_chars"),
      min((col("n_tokens_ws") <= col("n_tokens_bpe") &&
        col("n_tokens_bpe") <= col("n_chars_words")).cast("int"))
        .as("bounds_ok"))
    val decode = encodedWords(spark, dir)
      .agg(min((org.apache.spark.sql.functions.replace(
        col("encoded"), lit(SEP), lit("")) === col("word")).cast("int"))
        .as("decode_ok"))
    totals.crossJoin(decode)
  }

  val bpeEncodeGateSql: String =
    """WITH t AS (
      |  SELECT t.term FROM documents,
      |    UNNEST(string_split(text, ' ')) AS t(term)
      |  WHERE length(t.term) > 0)
      |SELECT CAST(COUNT(*) AS BIGINT) AS total_ws,
      |       CAST(SUM(length(term)) AS BIGINT) AS total_chars,
      |       1 AS bounds_ok, 1 AS decode_ok
      |FROM t""".stripMargin
}
