package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The end-to-end training-corpus pipeline in ONE query — the artifact
  * a training run actually consumes, and the integration tripwire for
  * cross-operator schema drift: every stage below is individually
  * hash-oracled, but only a composed query catches a stage changing
  * its output contract out from under the next one.
  *
  * Stages (each delegating to the operator that owns it):
  *   1. ingest   — the batch read of `documents`; stream ≡ batch for
  *                 this source is proven separately (IngestSpec: the
  *                 streaming dedup store replays to the same corpus).
  *   2. dedup    — near-dup survivors via LSH → connected components
  *                 ([[Components.cleanCorpus]] semantics, subsumes
  *                 exact dedup).
  *   3. decontaminate — drop eval-source rows and every doc sharing an
  *                 n-gram window with the eval set
  *                 ([[Decontaminate.governedCorpus]] = stages 2+3).
  *   4. quality  — per-language percentile filter on stopword ratio
  *                 ([[TextStats.qualityFiltered]]).
  *   5. shuffle  — seeded md5 permutation of the survivors (the
  *                 [[Pack.corpusShuffle]] key), so shard contents are a
  *                 reproducible pseudo-random mix, not source order.
  *   6. pack     — distributed prefix-sum sharding by token budget +
  *                 payload concatenation ([[Pack.packIntoShards]] /
  *                 [[Pack.packedPayloads]] machinery).
  *
  * Scale shape: the doc_id survivor sets from stages 2-4 are tiny
  * relative to the corpus and ride semi-joins (AQE broadcasts them);
  * the shuffle+pack pass moves only (key, weight) through the range
  * shuffle; text is re-attached once, by doc_id, for the final
  * per-shard concat — one key shuffle whose per-group state is budget-
  * bounded by construction. Nothing here funnels through one task.
  */
object Corpus {

  /** Packed training shards over the governed + quality-filtered
    * corpus, in seeded-shuffle order: (shard_id, n_docs, shard_tokens,
    * payload). Deterministic end to end (md5 permutation, integer
    * token weights), hence hash-oracled. */
  def trainingShards(spark: SparkSession, dir: String, seed: Int = 0,
      budget: Long = 4096L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val survivors = docs.select("doc_id", "text")
      .join(Decontaminate.governedCorpus(spark, dir).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .join(TextStats.qualityFiltered(spark, dir).select("doc_id"),
        Seq("doc_id"), "left_semi")
    // the corpusShuffle sort key: md5(seed:doc_id) prefix gives the
    // permutation, the doc_id suffix keeps it unique and parseable
    // back out — the prefix-sum shuffle stays (key, weight)-slim
    val keyed = survivors.select(
      concat(md5(concat(lit(s"graft:$seed:"), col("doc_id").cast("string"))),
        lit(":"), col("doc_id").cast("string")).as("k"),
      col("text"))
    Pack.packIntoShards(keyed, "k", size(split(col("text"), " ")), budget)
      .withColumn("doc_id",
        element_at(split(col("k"), ":"), 2).cast("long"))
      .join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("w").as("shard_tokens"),
        // order inside the shard = shuffle order (sort on the md5 key),
        // never collect_list arrival order
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("k"), col("text")))),
          s => s.getField("text"))).as("payload"))
  }

  /** [[trainingShards]] with the WEIGHTED-MIXING stage composed in —
    * the complete pipeline a real run ships: after governance and
    * quality filtering, survivors expand through the deterministic
    * per-source epoch weights ([[Mix.corpusMixFor]]: mix AFTER dedup,
    * so upsampling never multiplies rows a later stage would drop),
    * and the shuffle key salts in the epoch so repeats of a document
    * scatter across different shards instead of clumping. Output rows
    * are (shard_id, n_rows, shard_tokens, payload); still fully
    * deterministic → hash-oracled. */
  def trainingShardsMixed(spark: SparkSession, dir: String, seed: Int = 0,
      budget: Long = 4096L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val survivors = docs.select("doc_id", "text", "source")
      .join(Decontaminate.governedCorpus(spark, dir).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .join(TextStats.qualityFiltered(spark, dir).select("doc_id"),
        Seq("doc_id"), "left_semi")
    // the survivors scan already carried the text — ride it through
    // the zero-shuffle explode instead of re-joining documents for it
    // (the post-pack text re-attach below is the ONE documents join:
    // the pack shuffle stays (key, weight)-slim either way, and
    // joining back to the keyed frame instead would recompute — or
    // force materializing — the whole governance lineage)
    val mixed = Mix.corpusMixFor(survivors, carry = Seq("text"))
    val keyed = mixed.select(
      concat(md5(concat(lit(s"graft:$seed:"), col("doc_id").cast("string"),
          lit(":"), col("epoch").cast("string"))),
        lit(":"), col("doc_id").cast("string"),
        lit(":"), col("epoch").cast("string")).as("k"),
      col("text"))
    Pack.packIntoShards(keyed, "k", size(split(col("text"), " ")), budget)
      .withColumn("doc_id",
        element_at(split(col("k"), ":"), 2).cast("long"))
      .join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum("w").as("shard_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("k"), col("text")))),
          s => s.getField("text"))).as("payload"))
  }

  val trainingShardsMixedSql: String =
    s"""WITH surv AS (
       |  SELECT d.doc_id, d.text, d.source FROM documents d
       |  WHERE d.doc_id IN
       |        (SELECT doc_id FROM (${Decontaminate.governedCorpusSql}) gov)
       |    AND d.doc_id IN
       |        (SELECT doc_id FROM (${TextStats.qualityFilteredSql}) q)),
       |mw AS (
       |  SELECT doc_id, text,
       |         (CASE WHEN source = 'src0' THEN 250
       |               WHEN source = 'src1' THEN 40
       |               WHEN source = 'src2' THEN 0
       |               ELSE 100 END) AS wp,
       |         ${Mix.bucketSqlExpr} AS b
       |  FROM surv),
       |m AS (
       |  SELECT doc_id, text,
       |         CAST(unnest(range(wp // 100 +
       |           CASE WHEN b < wp % 100 THEN 1 ELSE 0 END)) AS BIGINT)
       |           AS epoch
       |  FROM mw
       |  WHERE wp // 100 + CASE WHEN b < wp % 100 THEN 1 ELSE 0 END > 0),
       |h AS (
       |  SELECT text,
       |         md5('graft:0:' || CAST(doc_id AS VARCHAR) || ':' ||
       |             CAST(epoch AS VARCHAR)) || ':' ||
       |           CAST(doc_id AS VARCHAR) || ':' ||
       |           CAST(epoch AS VARCHAR) AS k,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
       |  FROM m),
       |c AS (
       |  SELECT k, text, w,
       |         CAST(SUM(w) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
       |              AS BIGINT) AS cum_tokens
       |  FROM h)
       |SELECT (cum_tokens - w) // 4096 AS shard_id,
       |       COUNT(*) AS n_rows,
       |       CAST(SUM(w) AS BIGINT) AS shard_tokens,
       |       string_agg(text, ' ' ORDER BY k) AS payload
       |FROM c GROUP BY shard_id""".stripMargin

  val trainingShardsSql: String =
    s"""WITH surv AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  WHERE d.doc_id IN
       |        (SELECT doc_id FROM (${Decontaminate.governedCorpusSql}) gov)
       |    AND d.doc_id IN
       |        (SELECT doc_id FROM (${TextStats.qualityFilteredSql}) q)),
       |h AS (
       |  SELECT text,
       |         md5('graft:0:' || CAST(doc_id AS VARCHAR)) || ':' ||
       |           CAST(doc_id AS VARCHAR) AS k,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
       |  FROM surv),
       |c AS (
       |  SELECT k, text, w,
       |         CAST(SUM(w) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
       |              AS BIGINT) AS cum_tokens
       |  FROM h)
       |SELECT (cum_tokens - w) // 4096 AS shard_id,
       |       COUNT(*) AS n_docs,
       |       CAST(SUM(w) AS BIGINT) AS shard_tokens,
       |       string_agg(text, ' ' ORDER BY k) AS payload
       |FROM c GROUP BY shard_id""".stripMargin
}
