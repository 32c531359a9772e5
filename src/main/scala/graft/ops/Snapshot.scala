package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus snapshot diff — the versioning ledger a curation pipeline
  * publishes when a corpus is re-crawled or re-filtered: which
  * documents were ADDED, REMOVED, CHANGED, or are UNCHANGED between
  * two snapshot versions, plus rename detection (an "added" id whose
  * CONTENT already existed in v1 is a move/copy, not new data — it
  * must not be counted as fresh tokens by a mixing budget, and a
  * downstream dedup would collapse it anyway).
  *
  * Scale shape: the md5 content fingerprint is computed in the scan
  * projection, so document TEXT never reaches an exchange — the diff
  * is one (doc_id, fp)-slim full-outer sort-merge join on the id,
  * plus one distinct-fp probe join for rename detection (the fp side
  * pre-collapsed to DISTINCT before the join — the split-leakage
  * lesson: never probe with the raw duplicated side). On a
  * production lake where snapshots are day-partitioned, the id join
  * additionally prunes to partitions present in either version.
  *
  * The registered query derives v2 from the documents table by a
  * deterministic mutation (drops, edits, copies, and brand-new rows
  * keyed off `doc_id mod 17`) so DuckDB can rebuild the identical
  * pair of snapshots and the whole diff is hash-oracled end-to-end.
  */
object Snapshot {

  /** Diff two (doc_id, text) snapshots. Output: one row per doc_id
    * present in either version — (doc_id, status, content_in_old)
    * where status ∈ added | removed | changed | unchanged and
    * content_in_old = 1 iff an ADDED id's fingerprint already
    * existed somewhere in v1 (a move/copy). */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("fp_old"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("fp_new"))
    // distinct BEFORE the probe join: the corpus contains exact
    // duplicate contents; an un-collapsed fp side would fan out
    val oldFps = a.select(col("fp_old").as("fp")).distinct()
    a.join(b, Seq("doc_id"), "full_outer")
      .join(oldFps, col("fp_new") === col("fp"), "left")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed").as("status"),
        when(col("fp_old").isNull && col("fp").isNotNull, 1)
          .otherwise(0).as("content_in_old"))
  }

  /** The deterministic v2 mutation of the documents table the
    * registered query diffs against: doc_id mod 17 = 3 dropped,
    * = 5 edited (text + " rev2"), = 7 copied to a new id with the
    * SAME content (the rename case), = 8 spawns a brand-new doc. */
  def snapshotV2(docs: DataFrame): DataFrame = {
    val base = docs
      .where(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 5, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val copied = docs.where(col("doc_id") % 17 === 7)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    val fresh = docs.where(col("doc_id") % 17 === 8)
      .select((col("doc_id") + 2000000000L).as("doc_id"),
        concat(col("text"), lit(" brand new")).as("text"))
    base.unionByName(copied).unionByName(fresh)
  }

  def snapshotDiffDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    snapshotDiff(docs, snapshotV2(docs))
  }

  private val diffSql: String =
    """WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 17 = 5 THEN text || ' rev2'
      |                  ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000000, md5(text)
      |  FROM documents WHERE doc_id % 17 = 7
      |  UNION ALL
      |  SELECT doc_id + 2000000000, md5(text || ' brand new')
      |  FROM documents WHERE doc_id % 17 = 8),
      |oldfps AS (SELECT DISTINCT fp FROM v1),
      |j AS (
      |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |         a.fp AS fp_old, b.fp AS fp_new
      |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id),
      |d AS (
      |  SELECT j.doc_id,
      |         CASE WHEN j.fp_old IS NULL THEN 'added'
      |              WHEN j.fp_new IS NULL THEN 'removed'
      |              WHEN j.fp_old = j.fp_new THEN 'unchanged'
      |              ELSE 'changed' END AS status,
      |         CASE WHEN j.fp_old IS NULL AND o.fp IS NOT NULL
      |              THEN 1 ELSE 0 END AS content_in_old
      |  FROM j LEFT JOIN oldfps o ON o.fp = j.fp_new)""".stripMargin

  val snapshotDiffDocsSql: String = diffSql +
    "\nSELECT doc_id, status, content_in_old FROM d"

  /** Per-status governance counts + how many of the added ids are
    * moves of existing content — the one-page diff a data steward
    * reads before approving a snapshot promotion. */
  def snapshotDiffReport(spark: SparkSession, dir: String): DataFrame =
    snapshotDiffDocs(spark, dir)
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        sum("content_in_old").as("n_moved"))

  val snapshotDiffReportSql: String = diffSql +
    """
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(content_in_old) AS BIGINT) AS n_moved
      |FROM d GROUP BY status""".stripMargin
}
