package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, fingerprinting, language ID — all over the
  * `documents` table. Extension beyond the reference surface (SURVEY §7
  * step 7).
  *
  * Everything here is per-row narrow work built from codegen'd
  * `functions._` expressions: no shuffle, no UDFs, no state — it scales
  * linearly with input and pipelines inside whole-stage codegen directly
  * after the parquet scan. At 100 TB these run at scan speed.
  */
object TextStats {

  /** Whitespace tokens — split on single space, matching the corpus
    * format (and the DuckDB oracle's string_split). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexer tokens: letter runs, digit runs, or single
    * punctuation — the pre-tokenization regex families used by GPT-style
    * byte-pair encoders. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeTokenPattern), lit(0))

  /** Canonical text normalization for fingerprinting: lowercase,
    * non-alphanumeric runs collapsed to single spaces, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Stable 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Token counting per document (whitespace + BPE-ish). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("n_ws_tokens"),
      size(bpeTokens(col("text"))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars_computed"))

  val tokenCountsSql: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS n_ws_tokens,
      |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS n_bpe_tokens,
      |       length(text) AS n_chars_computed
      |FROM documents""".stripMargin

  /** English stopwords used by the quality score (public, standard). */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Quality scoring: the classic cheap pre-training filters — length,
    * punctuation density, digit density, stopword ratio, mean token
    * length. All ratios are exact-int / exact-int, so the doubles are
    * bit-deterministic across engines and partitionings. */
  /** Stopword-hit count over a token array — THE fluency proxy every
    * quality-ranked op shares ([[qualityScores]],
    * `Corpus.sourceCappedCorpus`, `Components.bestQualitySurvivors`);
    * one definition so a stopword-list or normalization change can
    * never make them rank by different scores. */
  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isin(enStopwords.map(x => x: Any): _*)))

  /** stopword_ratio of a text column: stopword tokens / tokens. */
  def stopwordRatio(text: Column): Column = {
    val toks = wsTokens(text)
    stopwordHits(toks).cast("double") / size(toks)
  }

  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val nToks = size(toks)
    val stopHits = stopwordHits(toks)
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[!-/:-@\\[-`{-~]", ""))
    val nDigits = length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_q"),
      nToks.as("n_tokens"),
      nPunct.as("n_punct"),
      nDigits.as("n_digits"),
      stopHits.as("n_stopwords"),
      (stopHits.cast("double") / nToks).as("stopword_ratio"),
      (nPunct.cast("double") / length(col("text"))).as("punct_ratio"),
      ((length(col("text")) - nToks + 1).cast("double") / nToks)
        .as("mean_token_len"))
  }

  val qualityScoresSql: String = {
    val stop = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |       length(text) AS n_chars_q,
       |       len(string_split(text, ' ')) AS n_tokens,
       |       length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS n_punct,
       |       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
       |       len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS n_stopwords,
       |       CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS stopword_ratio,
       |       CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
       |         / length(text) AS punct_ratio,
       |       CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
       |         / len(string_split(text, ' ')) AS mean_token_len
       |FROM documents""".stripMargin
  }

  /** Percentile-threshold quality filter — the composition every
    * pre-training mix runs: keep documents whose quality signal clears
    * a PER-STRATUM percentile (here: stopword ratio above each
    * language's 25th percentile, a cheap fluency proxy). The
    * thresholds table is #langs rows — broadcast, zero extra shuffle
    * on the document side; at 100 TB the exact `percentile` threshold
    * computation swaps to `approx_percentile` (or runs under the
    * sketch-mode rule) without touching this query shape. */
  def qualityFiltered(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(qualityScores(spark, dir)
        .select(col("doc_id"), col("stopword_ratio")), "doc_id")
    val thresholds = scored.groupBy("lang")
      .agg(round(percentile(col("stopword_ratio"), lit(0.25)), 4).as("thr"))
    scored.join(broadcast(thresholds), "lang")
      .where(col("stopword_ratio") > col("thr"))
      .select("doc_id", "lang", "stopword_ratio")
  }

  val qualityFilteredSql: String = {
    val stop = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |           / len(string_split(text, ' ')) AS stopword_ratio
       |  FROM documents),
       |t AS (SELECT lang, ROUND(quantile_cont(stopword_ratio, 0.25), 4) AS thr
       |      FROM s GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.stopword_ratio
       |FROM s JOIN t ON s.lang = t.lang
       |WHERE s.stopword_ratio > t.thr""".stripMargin
  }

  /** Shingle novelty score: per document, the fraction of its distinct
    * 3-gram shingles that occur in NO other document — the cheap
    * "how much of this is new text" signal used to rank near-dup
    * survivors and detect template spam. Reuses the dedup shingle
    * pipeline: one groupBy(shingle) for document frequencies, one
    * groupBy(doc) for the ratio — both key-shuffles with map-side
    * partials, nothing pairwise. Integer-count ratio → one IEEE
    * division, hash-portable. */
  def noveltyScores(spark: SparkSession, dir: String): DataFrame = {
    // Shuffle discipline: (a) group on the 8-byte shingle hash, never
    // the string (the hash is internal only; collision odds ~n²/2⁶⁵);
    // (b) NO shingle-level join back — a df==1 shingle has exactly one
    // owner, so min(doc_id) captured in the SAME aggregate names it,
    // and unique counts reduce shingle-level data to doc-level before
    // any join. Three map-side-combined key shuffles, all outputs
    // doc- or unique-shingle-sized; the exploded shingle set is never
    // shuffled twice. (The join-back formulation measured 3.3 s at
    // sf0.1; this one 1.9 s.)
    val sh = Dedup.shingles(Tables.documentsSpread(spark, dir), 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
    val perShingle = sh.groupBy("sh")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
    val uniqueCounts = perShingle.where(col("df") === 1)
      .groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(uniqueCounts, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
  }

  val noveltyScoresSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
      |       FROM t, UNNEST(range(1, len(toks)-1)) AS u(i)
      |       WHERE len(toks) >= 3),
      |d AS (SELECT s, COUNT(*) AS df, MIN(doc_id) AS owner
      |      FROM sh GROUP BY s),
      |u AS (SELECT owner AS doc_id, COUNT(*) AS n_unique
      |      FROM d WHERE df = 1 GROUP BY owner),
      |n AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
      |SELECT n.doc_id, n.n_shingles,
      |       COALESCE(u.n_unique, 0) AS n_unique,
      |       CAST(COALESCE(u.n_unique, 0) AS DOUBLE) / n.n_shingles
      |         AS novelty
      |FROM n LEFT JOIN u ON n.doc_id = u.doc_id""".stripMargin

  /** Content fingerprints (md5 of normalized text) + duplicate-group
    * count per fingerprint. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), fingerprint(col("text")).as("fp"))

  val fingerprintsSql: String =
    """SELECT doc_id,
      |       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    * hash every char k-gram, then keep the minimum of each sliding
    * window of w consecutive hashes — guarantees any shared substring
    * of length ≥ k+w−1 yields a shared fingerprint. The classic
    * copy-detection / near-dup signature. xxhash64 of the k-gram
    * replaces the paper's polynomial rolling hash (any uniform hash
    * works; this one is engine-native).
    *
    * Shape (same lesson as MinHash, measured the hard way): a per-row
    * `transform(windows, j -> array_min(slice(hashes, …)))` re-evaluates
    * the whole hash array per window position, interpreted — O(len²)
    * per document and ~100 s on the 5k-doc bench. This explode + sliding
    * `min().over(rowsBetween(0, w-1))` form keeps hashing and minima in
    * codegen'd operators; the only shuffle carries (doc_id, pos, hash).
    */
  def winnowingFor(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val positions = docs
      .where(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1), length(col("text")) - (k - 1))))
      .select(col("doc_id"), col("col").as("pos"),
        xxhash64(col("text").substr(col("col"), lit(k))).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val maxPos = Window.partitionBy(col("doc_id"))
    positions
      .withColumn("win_min", min(col("h")).over(win))
      .withColumn("max_pos", max(col("pos")).over(maxPos))
      .where(col("pos") <= col("max_pos") - (w - 1)) // full windows only
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("win_min"))).as("fingerprints"))
  }

  /** Fingerprint summary per document (rows-only check: hash values
    * aren't portable to the oracle engine; set semantics are
    * unit-tested instead). */
  def winnowing(spark: SparkSession, dir: String): DataFrame =
    winnowingFor(Tables.documentsSpread(spark, dir))
      .select(col("doc_id"), size(col("fingerprints")).as("n_fingerprints"),
        col("fingerprints"))

  /** Oracle variant of winnowing: identical algorithm with the k-gram
    * hash swapped from xxhash64 (engine-native, fast path) to an
    * md5-low-bits integer that BOTH engines compute identically — so
    * the fingerprint COUNTS hash-match DuckDB, proving the winnow
    * machinery (k-gram explode, sliding minima, full-window cut,
    * distinct) end-to-end. The xxhash64 path stays the production
    * default; only the hash differs. */
  def winnowingPortable(spark: SparkSession, dir: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kgramHash =
      conv(substring(md5(col("text").substr(col("col"), lit(k))), 25, 8),
        16, 10).cast("long")
    val positions = Tables.documentsSpread(spark, dir)
      .where(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1), length(col("text")) - (k - 1))))
      .select(col("doc_id"), col("col").as("pos"), kgramHash.as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val maxPos = Window.partitionBy(col("doc_id"))
    positions
      .withColumn("win_min", min(col("h")).over(win))
      .withColumn("max_pos", max(col("pos")).over(maxPos))
      .where(col("pos") <= col("max_pos") - (w - 1))
      .groupBy("doc_id")
      .agg(count_distinct(col("win_min")).as("n_fingerprints"))
  }

  val winnowingPortableSql: String =
    """WITH pos AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |         CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 25, 8))
      |              AS BIGINT) AS h
      |  FROM documents, UNNEST(range(1, length(text) - 6)) AS u(i)
      |  WHERE length(text) >= 8),
      |m AS (
      |  SELECT doc_id, i,
      |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
      |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
      |           AS win_min,
      |         MAX(i) OVER (PARTITION BY doc_id) AS max_i
      |  FROM pos)
      |SELECT doc_id, COUNT(DISTINCT win_min) AS n_fingerprints
      |FROM m WHERE i <= max_i - 3
      |GROUP BY doc_id""".stripMargin

  // ----- language ID -----

  /** Per-language marker stopword profiles (public, standard closed-class
    * words — highest-frequency function words per language). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "for", "with", "was", "this", "a"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un",
      "une", "que", "dans", "pour", "il"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un",
      "una", "que", "en", "por", "del"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine",
      "nicht", "mit", "fur", "von", "zu", "den"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "una", "per",
      "non", "sono", "con", "del", "gli"),
    "pt" -> Seq("o", "a", "os", "as", "de", "e", "que", "um", "uma",
      "para", "nao", "com", "do"))

  /** Heuristic language ID: CJK/Cyrillic/Arabic script detection by
    * char range first, else argmax of *distinct* marker-stopword hits
    * across [[langProfiles]], `und` when nothing matches.
    * `array_intersect` (codegen'd native set intersection) beats a
    * `filter(_.isin(...))` lambda (interpreted, per-token linear scan)
    * by an order of magnitude — this runs at scan speed. */
  def langIdCol(text: Column): Column =
    langIdCol(text, split(lower(text), "\\s+"))

  /** Two-argument form: `toks` is the lower-cased whitespace token
    * array, pre-materialized by the caller in its own projection so it
    * is tokenized ONCE per row — the single-arg form embeds the split
    * inside every per-language `array_intersect`, and whether codegen
    * subexpression elimination collapses those copies depends on the
    * surrounding tree (the ops/Spans lesson, expression-reuse flavor). */
  def langIdCol(text: Column, toks: Column): Column = {
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*)))
          .as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(text.rlike("[\\u4e00-\\u9fff\\u3040-\\u30ff]"), lit("zh-ja"))
      .when(text.rlike("[\\u0400-\\u04ff]"), lit("ru"))
      .when(text.rlike("[\\u0600-\\u06ff]"), lit("ar"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Language-ID over documents. Hash-oracled via [[langIdSql]] (every
    * signal is an integer count or script-range regex, so the heuristic
    * is SQL-portable; see the tie-break equivalence note there).
    * Behavioral correctness on crafted multilingual fixtures is asserted
    * in LangIdSpec; the corpus `lang` column is a random label over
    * uniformly English-vocab synthetic text, so agreement with it is not
    * a meaningful target. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"),
        split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        langIdCol(col("text"), col("toks")).as("lang_pred"))

  /** Oracle form of [[langId]]: every signal is an integer count or a
    * script-range regex, so the heuristic is fully SQL-portable. The
    * tie-break (greatest score → lexicographically greatest language)
    * is restated as a reverse-alphabetical CASE chain, which is
    * equivalent to Spark's struct-max. */
  val langIdSql: String = {
    val scoreCols = langProfiles.toSeq.sortBy(_._1).map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_intersect(toks, $lst)) AS s_$l"
    }.mkString(",\n       ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         string_split_regex(lower(text), '\\s+') AS toks
       |  FROM documents),
       |s AS (SELECT doc_id, text,
       |       $scoreCols
       |      FROM t)
       |SELECT doc_id,
       |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]') THEN 'zh-ja'
       |       WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
       |       WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
       |       WHEN greatest(s_de,s_en,s_es,s_fr,s_it,s_pt) > 0 THEN
       |         CASE greatest(s_de,s_en,s_es,s_fr,s_it,s_pt)
       |           WHEN s_pt THEN 'pt' WHEN s_it THEN 'it' WHEN s_fr THEN 'fr'
       |           WHEN s_es THEN 'es' WHEN s_en THEN 'en' ELSE 'de' END
       |       ELSE 'und' END AS lang_pred
       |FROM s""".stripMargin
  }
}
