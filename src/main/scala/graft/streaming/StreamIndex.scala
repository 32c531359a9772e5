package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.Terms

/** Continuous BM25 indexing — the incremental form of
  * `Terms.buildBm25Index`, composed the way [[StreamShards]] composes
  * the dedup store: a document stream drives one
  * [[Terms.appendToBm25Index]] per micro-batch, so the searchable
  * index trails the corpus by one trigger without ever re-reading
  * history. Because the index's per-term df is DERIVED (not stored)
  * and its corpus stats update additively, the streamed index answers
  * probes bit-identically to a one-shot batch build — proven in
  * StreamingSpec, the `q_stream_agg` stream ≡ batch discipline
  * applied to a persisted search artifact.
  *
  * Exactly-once: Structured Streaming may re-deliver the last
  * COMPLETED batch after a restart (the checkpoint records offsets
  * before `foreachBatch` returns); an already-applied batch must not
  * double-count its postings. The `applied` sidecar (1 row: the last
  * applied batch id, written after the apply) makes that re-delivery
  * a no-op. A crash strictly inside an append leaves the same
  * torn-files boundary every file-based sink has — the
  * [[Ingest]]-store answer (write postings, then sidecars, marker
  * last) bounds the damage to one re-appendable batch. */
object StreamIndex {

  private def lastApplied(spark: SparkSession, indexPath: String): Long =
    try spark.read.parquet(s"$indexPath/applied").head().getLong(0)
    catch { case _: Exception => -1L }

  /** Apply one micro-batch of (doc_id, text) documents to the index
    * at `indexPath`: the first batch builds (overwrite — naturally
    * idempotent), later batches append; a batch id at or below the
    * applied marker no-ops. */
  def applyBm25Batch(spark: SparkSession, indexPath: String,
      batch: DataFrame, batchId: Long, nBuckets: Int = 64): Unit = {
    if (batchId <= lastApplied(spark, indexPath)) return
    val hasIndex = java.nio.file.Files
      .exists(java.nio.file.Paths.get(s"$indexPath/stats"))
    if (!hasIndex) Terms.buildBm25IndexFor(batch, indexPath, nBuckets)
    else Terms.appendToBm25Index(spark, indexPath, batch)
    spark.range(1).select(lit(batchId).as("last_batch"))
      .write.mode("overwrite").parquet(s"$indexPath/applied")
  }

  /** Drive indexing over every file currently in `srcDir` (resuming
    * from the checkpoint), one micro-batch per file so the
    * append path is exercised across batches. The index lands under
    * `workDir/bm25index`. */
  def runIngestBm25(spark: SparkSession, srcDir: String,
      schema: StructType, workDir: String, nBuckets: Int = 64): Unit = {
    val indexPath = s"$workDir/bm25index"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBm25Batch(batch.sparkSession, indexPath,
          batch.select("doc_id", "text"), id, nBuckets)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
