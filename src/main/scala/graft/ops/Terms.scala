package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus term statistics and per-document distinctive terms (TF-IDF
  * family) — the vocabulary/feature layer of a text pipeline.
  *
  * Scale design: term frequencies are one explode + one groupBy on
  * (doc_id, term) — partial aggregation absorbs the token explosion
  * map-side, so the shuffle carries one row per distinct (doc, term).
  * Document frequencies reuse the tf output (groupBy term). The
  * distinctive-term ranking windows by doc_id — a high-cardinality
  * partition key, so WindowExec parallelizes; no global sort anywhere.
  *
  * Determinism note: scoring uses the rational idf tf/df — ONE IEEE
  * division of two integers, which is bit-exact on every engine — so
  * ranks hash-match the SQL oracle. A log-idf (`tf·ln(N/df)`) swap-in
  * is a one-line change but transcendental functions are not bit-exact
  * across engines, so the portable score is the shipped default. */
object Terms {

  /** (doc_id, term, tf) for whitespace tokens. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary head: the 100 most document-frequent terms. */
  def termStats(spark: SparkSession, dir: String): DataFrame =
    termFrequencies(Tables.documents(spark, dir))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(100)

  val termStatsSql: String =
    """WITH tf AS (
      |  SELECT doc_id, t.term, COUNT(*) AS tf
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
      |  GROUP BY 1, 2)
      |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf
      |FROM tf GROUP BY term
      |ORDER BY df DESC, term LIMIT 100""".stripMargin

  /** Top-5 distinctive terms per document: rank by tf/df descending
    * (frequent in the doc, rare in the corpus), term ascending
    * tie-break. */
  def topTermsPerDoc(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val tf = termFrequencies(Tables.documents(spark, dir))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    tf.join(df_, "term")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "rank")
  }

  val topTermsPerDocSql: String =
    """WITH tf AS (
      |  SELECT doc_id, t.term, COUNT(*) AS tf
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
      |  GROUP BY 1, 2),
      |d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
      |SELECT doc_id, term, tf, df, rank FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, d.df,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY tf.doc_id
      |           ORDER BY CAST(tf.tf AS DOUBLE) / d.df DESC, tf.term) AS rank
      |  FROM tf JOIN d ON tf.term = d.term)
      |WHERE rank <= 5""".stripMargin
}
