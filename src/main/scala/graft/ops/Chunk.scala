package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sliding-window document chunking — the tokenize-adjacent step every
  * pre-training pipeline runs: split each document into fixed-size
  * token windows with overlap (stride < window), so no context is lost
  * at chunk boundaries.
  *
  * Chunk i of a document with n tokens covers token positions
  * [i·stride + 1, i·stride + window]; the last chunk is the first one
  * whose window reaches the end (i_max = ⌈(n − window) / stride⌉,
  * floored at 0), so every token appears in ≥ 1 chunk and no chunk is
  * fully contained in its predecessor.
  *
  * Shape at 100 TB: pure per-row compute — one `sequence` +
  * `posexplode` per document (fan-out ≈ n/stride), `slice` +
  * `concat_ws` per chunk, zero shuffles, fully codegen-compatible
  * scan-speed work. Chunk count arithmetic is integer-only
  * (`(n − window + stride − 1) div stride`), so the output is exact
  * and hash-oracled against DuckDB.
  */
object Chunk {

  /** Chunk `textCol` into `window`-token pieces every `stride` tokens.
    * Output: one row per (doc, chunk): chunk_id, chunk_text,
    * n_chunk_tokens. */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), TextStats.wsTokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("i_max",
        expr(s"CASE WHEN n_toks > $window " +
          s"THEN (n_toks - $window + $stride - 1) div $stride ELSE 0 END"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0L, i_max)")).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        concat_ws(" ",
          slice(col("toks"),
            (col("chunk_id") * stride + 1).cast("int"), lit(window)))
          .as("chunk_text"),
        size(slice(col("toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(window)))
          .as("n_chunk_tokens"))
  }

  /** 64-token windows, stride 48 (16-token overlap) over `documents`. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunkTokens(Tables.documents(spark, dir), window = 64, stride = 48)

  /** Chunk-level exact dedup — boilerplate removal at paragraph
    * grain: identical chunk text ACROSS documents (shared headers,
    * license blocks, templated passages) collapses to one surviving
    * (doc, chunk), the lexicographic min, while every chunk keeps a
    * pointer to its representative. Document-level dedup misses these
    * (the surrounding text differs); chunk grain is where repeated
    * boilerplate actually lives.
    *
    * Scale shape: the only shuffle carries (md5, doc_id, chunk_id) —
    * 16-byte fingerprints, never chunk text (md5 is computed in the
    * chunking scan and the text column is dropped before the
    * exchange). All three window functions share one (fp)-partitioned
    * spec, a high-cardinality key, so WindowExec parallelizes; ids
    * are unique per (doc, chunk) so the ordering is total and the
    * output deterministic — hash-oracled against DuckDB. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col("doc_id"), col("chunk_id"))
    chunkDocs(spark, dir)
      .select(col("doc_id"), col("chunk_id"),
        md5(col("chunk_text")).as("fp"))
      .select(col("doc_id"), col("chunk_id"),
        first("doc_id").over(w).as("rep_doc_id"),
        first("chunk_id").over(w).as("rep_chunk_id"),
        (row_number().over(w) === 1).cast("int").as("survivor"))
  }

  val chunkDedupSql: String =
    """WITH ch AS (
      |  WITH t AS (
      |    SELECT doc_id, string_split(text, ' ') AS toks,
      |           len(string_split(text, ' ')) AS n
      |    FROM documents),
      |  c AS (
      |    SELECT doc_id, toks, u.i AS chunk_id
      |    FROM t, UNNEST(range(0, 1 + CASE WHEN n > 64
      |                                     THEN (n - 64 + 47) // 48
      |                                     ELSE 0 END)) AS u(i))
      |  SELECT doc_id, chunk_id,
      |         array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
      |           AS chunk_text
      |  FROM c),
      |f AS (SELECT doc_id, chunk_id, md5(chunk_text) AS fp FROM ch)
      |SELECT doc_id, chunk_id,
      |       FIRST_VALUE(doc_id) OVER w AS rep_doc_id,
      |       FIRST_VALUE(chunk_id) OVER w AS rep_chunk_id,
      |       CAST(ROW_NUMBER() OVER w = 1 AS INT) AS survivor
      |FROM f
      |WINDOW w AS (PARTITION BY fp ORDER BY doc_id, chunk_id)""".stripMargin

  val chunkDocsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |         len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, u.i AS chunk_id
      |  FROM t, UNNEST(range(0, 1 + CASE WHEN n > 64
      |                                   THEN (n - 64 + 47) // 48
      |                                   ELSE 0 END)) AS u(i))
      |SELECT doc_id, chunk_id,
      |       array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
      |         AS chunk_text,
      |       len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64])
      |         AS n_chunk_tokens
      |FROM c""".stripMargin
}
