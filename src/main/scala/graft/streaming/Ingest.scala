package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.TextStats

/** Continuous corpus ingest — the steady-state shape of a 100 TB
  * training-data pipeline: a file stream of raw document batches,
  * each micro-batch exact-deduped against the PERSISTED fingerprint
  * store before its survivors append to the corpus. `foreachBatch`
  * composes the batch operators (fingerprint, anti-join, min-id
  * collapse) per micro-batch, and the checkpoint makes re-runs
  * process only new files.
  *
  * Shuffle discipline per batch: the history side is a (fp)-only
  * table — 16 bytes/row, never text — so the anti-join shuffle is
  * fingerprint-sized regardless of corpus size; with the store
  * bucketed by fp it becomes shuffle-free (ScaleSpec's bucketed-join
  * shape). Batch text is scanned once.
  *
  * Write-order semantics (documented, not hidden): corpus first, then
  * store. A crash between the two can re-append one batch's
  * survivors on retry — at-least-once at the batch boundary, healed
  * by any downstream exact dedup; flipping the order would instead
  * LOSE that batch. A transactional table format (Delta) is the
  * production fix; parquet-only, this is the honest trade. Re-running
  * the whole pipeline over already-ingested files is a no-op by the
  * checkpoint, and re-delivering old CONTENT is a no-op by the
  * fp store (both tested in IngestSpec). */
object Ingest {

  val storeSchema: StructType =
    StructType(Seq(StructField("fp", StringType, nullable = false)))

  /** One micro-batch: survivors (new content, min doc_id per fp) and
    * their fingerprints. Exposed for testing the batch semantics
    * without the stream. */
  def ingestBatch(batch: DataFrame, history: DataFrame): DataFrame = {
    val fresh = batch
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .join(history.select("fp"), Seq("fp"), "left_anti")
    val keep = fresh.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    fresh.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
  }

  private def readStore(spark: SparkSession, storeDir: String): DataFrame =
    if (new java.io.File(storeDir).exists())
      spark.read.schema(storeSchema).parquet(storeDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)

  /** Drive the ingest over every file currently in `srcDir` (resumes
    * from `checkpointDir`; one micro-batch per file so cross-batch
    * dedup is exercised). Appends survivors to `corpusDir` and their
    * fingerprints to `storeDir`. */
  def runIngest(spark: SparkSession, srcDir: String, schema: StructType,
      corpusDir: String, storeDir: String, checkpointDir: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val survivors = ingestBatch(batch, readStore(s, storeDir))
          .localCheckpoint() // both writes below consume it once
        survivors.drop("fp")
          .write.mode("append").parquet(corpusDir)
        survivors.select("fp")
          .write.mode("append").parquet(storeDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
