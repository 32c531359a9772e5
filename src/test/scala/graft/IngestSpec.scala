package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Schemas, Tables}
import graft.ops.TextStats
import graft.streaming.Ingest

/** Continuous ingest: stream of document batches → per-batch dedup
  * against the persisted fingerprint store → corpus append. */
class IngestSpec extends AnyFunSuite with SharedSpark {

  test("streamed ingest == batch first-arrival dedup over the union; " +
    "re-delivery and re-runs are no-ops") {
    val base = Files.createTempDirectory("graft-ingest").toString
    val (src, corpus, store, ckpt) =
      (s"$base/src", s"$base/corpus", s"$base/store", s"$base/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(src))

    val docs = Tables.documents(spark, sf).cache()

    // batch 1: doc_id < 170. batch 2: 170..339 PLUS re-delivered copies
    // of batch-1 content under new ids (5000+). batch 3: the rest plus
    // copies of batch-2 content (6000+). Arrival order == id order, so
    // first-arrival == min doc_id per fingerprint.
    val b1 = docs.where(col("doc_id") < 170)
    val b2 = docs.where(col("doc_id") >= 170 && col("doc_id") < 340)
      .unionByName(b1.limit(20).withColumn("doc_id", col("doc_id") + 5000))
    val b3 = docs.where(col("doc_id") >= 340)
      .unionByName(docs.where(col("doc_id") >= 170 && col("doc_id") < 190)
        .withColumn("doc_id", col("doc_id") + 6000))

    // one parquet FILE per batch (the stream triggers per file)
    b1.coalesce(1).write.parquet(s"$src/b1")
    b2.coalesce(1).write.parquet(s"$src/b2")
    b3.coalesce(1).write.parquet(s"$src/b3")
    for (f <- Seq("b1", "b2", "b3")) {
      val dir = new java.io.File(s"$src/$f")
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$f.parquet"))
      dir.listFiles().foreach(_.delete()); dir.delete()
    }

    Ingest.runIngest(spark, src, Schemas.documents, corpus, store, ckpt)

    val union = b1.unionByName(b2).unionByName(b3)
      .withColumn("fp", TextStats.fingerprint(col("text")))
    val expected = union
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val got = spark.read.schema(Schemas.documents).parquet(corpus)

    // corpus == min-id survivor per unique content, exactly once
    assert(got.count() === expected.count())
    assert(got.select("doc_id").exceptAll(expected).count() === 0)
    // none of the re-delivered copies survived
    assert(got.where(col("doc_id") >= 5000).count() === 0)
    // store holds exactly the distinct fingerprints
    val fps = spark.read.parquet(store)
    assert(fps.count() === union.select("fp").distinct().count())
    assert(fps.distinct().count() === fps.count())

    // re-run with no new files: checkpoint makes it a no-op
    Ingest.runIngest(spark, src, Schemas.documents, corpus, store, ckpt)
    assert(spark.read.schema(Schemas.documents).parquet(corpus).count()
      === expected.count())

    // NEW file re-delivering OLD content: fp store makes it a no-op
    b1.limit(30).withColumn("doc_id", col("doc_id") + 7000)
      .coalesce(1).write.parquet(s"$src/b4")
    val dir4 = new java.io.File(s"$src/b4")
    val part4 = dir4.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part4.toPath, java.nio.file.Paths.get(s"$src/b4.parquet"))
    dir4.listFiles().foreach(_.delete()); dir4.delete()
    Ingest.runIngest(spark, src, Schemas.documents, corpus, store, ckpt)
    assert(spark.read.schema(Schemas.documents).parquet(corpus).count()
      === expected.count())

    docs.unpersist()
  }
}
