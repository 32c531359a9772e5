package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Benchmark decontamination — remove training documents that overlap
  * an evaluation set, the standard n-gram inverted-index check (flag a
  * training doc if it shares any length-n token window with any eval
  * doc). Extension beyond the reference surface (SURVEY §7 step 7):
  * the governance step that runs right after dedup in a training-data
  * pipeline.
  *
  * Scale design:
  *  - Shingles are hashed to a 16-byte md5 fingerprint BEFORE the
  *    join, so the shuffle carries (doc_id, fp) — never text. (md5,
  *    not xxhash64, keeps the whole pipeline engine-portable and hence
  *    hash-oracled; at 100 TB you'd swap in xxhash64 for an 8-byte key
  *    with this op unchanged.)
  *  - The eval side is distinct fingerprints only. Benchmark suites
  *    are orders of magnitude smaller than the corpus, so AQE
  *    broadcasts that side at runtime; no unconditional broadcast hint
  *    (a giant eval set degrades to a plain shuffle join instead of
  *    failing).
  *  - Match counting is a partial-aggregable count per doc: map-side
  *    combine collapses each task's hits before the shuffle.
  *
  * Reference scope: the reference pipeline has no decontamination
  * stage; semantics follow the published n-gram overlap procedure
  * used by large-model training-data reports.
  */
object Decontaminate {

  /** Distinct hashed token n-grams per document: (doc_id, fp) with fp
    * = md5 of the space-joined window. Docs shorter than n tokens
    * produce none (they cannot contain a full window). */
  def shingleFps(docs: DataFrame, n: Int): DataFrame =
    docs
      // tokenize ONCE per row: split(text) referenced inside the
      // transform lambda re-tokenizes the document per window (the
      // ops/Spans lesson; multi-ref non-cheap alias, so CollapseProject
      // keeps the projection)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - n),
          i => md5(concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))))
          .as("fp"))

  /** Per-document contamination report: for every training doc that
    * shares at least one n-gram with the eval set, the number of
    * distinct shared n-grams. Docs with zero hits are absent (the
    * common case — keep the result proportional to the contamination,
    * not the corpus). */
  def contaminationReport(trainDocs: DataFrame, evalDocs: DataFrame,
      n: Int): DataFrame =
    shingleFps(trainDocs, n)
      .join(shingleFps(evalDocs, n).select("fp").distinct(), "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))

  /** Oracle query: `src19` plays the held-out benchmark; every other
    * source is training data. n=4 token windows. */
  def contaminated(spark: SparkSession, dir: String,
      evalSource: String = "src19", n: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
    contaminationReport(
      docs.where(col("source") =!= evalSource),
      docs.where(col("source") === evalSource), n)
  }

  val contaminatedSql: String =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
      |           FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |              md5(array_to_string(toks[i:i+3], ' ')) AS fp
      |       FROM t, UNNEST(range(1, len(toks)-2)) AS u(i)
      |       WHERE len(toks) >= 4),
      |ev AS (SELECT DISTINCT fp FROM sh WHERE source = 'src19')
      |SELECT s.doc_id, COUNT(*) AS n_hits
      |FROM sh s JOIN ev USING (fp)
      |WHERE s.source <> 'src19'
      |GROUP BY s.doc_id""".stripMargin

  /** The decontaminated corpus: training docs minus everything the
    * report flagged. One anti-join on doc_id — the flagged set is
    * tiny, AQE broadcasts it. */
  def decontaminatedCorpus(spark: SparkSession, dir: String,
      evalSource: String = "src19", n: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .where(col("source") =!= evalSource)
      .join(contaminated(spark, dir, evalSource, n).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")

  val decontaminatedCorpusSql: String =
    s"""WITH hits AS ($contaminatedSql)
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE source <> 'src19'
       |  AND doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin

  /** The full governance pipeline in one artifact: near-dup dedup
    * survivors ([[Components.cleanCorpus]]) minus the eval source and
    * minus every contaminated doc — the corpus a training mix would
    * actually consume. Two anti-join-style filters over the cleaned
    * corpus; both right sides are tiny (flagged ids), so AQE
    * broadcasts them. */
  def governedCorpus(spark: SparkSession, dir: String,
      evalSource: String = "src19", n: Int = 4,
      memoComponents: Boolean = false): DataFrame =
    Components.cleanCorpus(spark, dir, memoComponents)
      .where(col("source") =!= evalSource)
      .join(contaminated(spark, dir, evalSource, n).select("doc_id"),
        Seq("doc_id"), "left_anti")

  val governedCorpusSql: String =
    s"""WITH hits AS ($contaminatedSql)
       |SELECT doc_id, lang, source, n_chars
       |FROM (${Components.cleanCorpusSql}) clean
       |WHERE source <> 'src19'
       |  AND doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin
}
