package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale check (sf10-equivalent: 60M lineitem, 15M orders, 10M
  * events) for the core relational/window/streaming-shaped operators —
  * two orders of magnitude above the bench SF, big enough that a
  * wrong plan shape (payload shuffle, single-task stage, unpartial'd
  * agg) stops hiding in constant overhead. The quadratic-by-design
  * oracle paths are excluded on purpose; their scale variants are
  * covered by the 10× harness (graft.Stress).
  *
  * Replication is a crossJoin with a range — ONE scan fanning out to
  * 100 copies (a 100-way union would re-plan the scan 100 times). */
object Stress100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/stress100x"
    def xN(df: DataFrame, idCol: String, n: Int): DataFrame =
      df.crossJoin(spark.range(n).toDF("rep"))
        .withColumn(idCol, col(idCol) + col("rep") * 1000000000L)
        .drop("rep")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    def t(l: String)(f: => Unit): Unit = { val t0 = System.nanoTime()
      try { f; println(f"[stress100] $l ${(System.nanoTime() - t0) / 1e9}%.1f s") }
      catch { case e: Throwable =>
        // e.toString, never e.getMessage: a null message (bare NPE)
        // would NPE the handler and kill the whole multi-hour board
        println(s"[stress100] $l FAILED: ${e.toString.take(200)}") } }

    t("build 60M lineitem")(xN(graft.core.Tables.lineitem(spark, dir), "l_orderkey", 100)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet"))
    t("build 15M orders  ")(xN(graft.core.Tables.orders(spark, dir), "o_orderkey", 100)
      .write.mode("overwrite").parquet(s"$out/orders.parquet"))
    t("build 10M events  ")(xN(graft.core.Tables.events(spark, dir), "event_id", 100)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet"))
    for (tb <- Seq("customer", "nation", "region", "supplier", "part"))
      graft.core.Tables.load(spark, dir, tb)
        .write.mode("overwrite").parquet(s"$out/$tb.parquet")

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    t("q1 60M rows       ")(force(graft.engine.Relational.q1PricingSummary(spark, out)))
    t("join 60Mx15M      ")(force(graft.engine.Relational.revenueByPriority(spark, out)))
    t("star join 15M     ")(force(graft.engine.Relational.revenueByRegion(spark, out)))
    t("argmax 15M        ")(force(graft.engine.Relational.latestBestOrderPerCustomer(spark, out)))
    t("daily agg 10M     ")(force(graft.engine.Relational.eventsDailyAgg(spark, out)))
    t("topk best day 10M ")(force(graft.engine.Relational.topKByBestDay(spark, out)))
    t("pctile approx 10M ")(force(graft.engine.Relational.valuePercentilesApprox(spark, out)))
    t("funnel 10M        ")(force(graft.engine.Relational.signupFunnel(spark, out)))
    t("trailing 15M      ")(force(graft.engine.Windows.trailingSpend(spark, out)))
    t("sessions 10M      ")(force(graft.streaming.Sessionize.sessionsQuery(spark, out)))
    t("asof 10Mx15M      ")(force(graft.plans.AsOfJoin.eventsWithLatestOrder(spark, out)))

    // document ops at 20× (100k docs, 4× duplication preserved by id
    // offsetting): the full LSH → connected-components dedup flow
    t("build 100k docs   ")(xN(graft.core.Tables.documents(spark, dir), "doc_id", 20)
      .write.mode("overwrite").parquet(s"$out/documents.parquet"))
    t("lsh clusters 100k ")(force(graft.ops.Components.lshDedupClusters(spark, out)))
    t("chunk 100k docs   ")(force(graft.ops.Chunk.chunkDocs(spark, out)))
    t("chunk dedup 100k  ")(force(graft.ops.Chunk.chunkDedup(spark, out)))
    t("repetition 100k   ")(force(graft.ops.Repetition.repetitionSignals(spark, out)))
    t("shuffle 100k docs ")(force(graft.ops.Pack.corpusShuffle(spark, out)))

    // BM25: index build (one tf pass + bucketed write) vs the pruned
    // probe — the probe must NOT scale with the corpus scan (it reads
    // only the query terms' buckets); the flat path rescans per batch
    t("bm25 build 100k   ")(
      graft.ops.Terms.buildBm25Index(spark, out, s"$out/bm25index"))
    // query-set derivation (a vocabulary scan) happens OUTSIDE the
    // probe timer — the probe number isolates the bucket-pruned path
    val bmQueries = graft.ops.Terms.dfRankQueries(
      spark.read.parquet(s"$out/bm25index/postings")
        .groupBy("term").agg(count(lit(1)).as("df"))).localCheckpoint()
    t("bm25 probe 100k   ")(force(graft.ops.Terms.bm25IndexedTopK(
      spark, s"$out/bm25index", bmQueries)))
    t("bm25 flat 100k    ")(force(graft.ops.Terms.bm25TopK(spark, out)))

    // repetition crossover: the shipped single-scan (kind, gram) shape
    // vs the superseded TWO-SCAN shape (unigram pass + bigram pass +
    // doc-level join) it replaced — the rewrite benched ~1.3× slower
    // at sf0.1, where per-query constant overhead dominates; this
    // measures where the one-scan-of-the-corpus saving overtakes it.
    def repTwoScan(d: String): DataFrame = {
      val toks = graft.core.Tables.documents(spark, d)
        .select(col("doc_id"), graft.ops.TextStats.wsTokens(col("text")).as("toks"))
      val uni = toks.select(col("doc_id"), explode(col("toks")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct_tokens"), max("c").as("top_token_n"))
      val bi = toks.select(col("doc_id"), explode(expr(
          "filter(transform(sequence(1, size(toks)), i -> " +
            "IF(i < size(toks), concat(element_at(toks, i), ' ', " +
            "element_at(toks, i + 1)), CAST(null AS string))), " +
            "g -> g IS NOT NULL)")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n_bigrams"),
          count(lit(1)).as("n_distinct_bigrams"), max("c").as("top_bigram_n"))
      uni.join(bi, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_bigrams", "n_distinct_bigrams", "top_bigram_n"))
        .select(col("doc_id"),
          (col("n_distinct_tokens").cast("double") / col("n_tokens"))
            .as("distinct_token_ratio"),
          (col("top_token_n").cast("double") / col("n_tokens"))
            .as("top_token_frac"),
          when(col("n_bigrams") > 0, (col("n_bigrams") -
            col("n_distinct_bigrams")).cast("double") / col("n_bigrams"))
            .otherwise(0.0).as("dup_bigram_frac"),
          when(col("n_bigrams") > 0,
            col("top_bigram_n").cast("double") / col("n_bigrams"))
            .otherwise(0.0).as("top_bigram_frac"))
    }
    t("build 50k docs 10x")(xN(graft.core.Tables.documents(spark, dir), "doc_id", 10)
      .write.mode("overwrite").parquet(s"$out/d10/documents.parquet"))
    t("rep 1scan 10x     ")(force(graft.ops.Repetition.repetitionSignals(spark, s"$out/d10")))
    t("rep 2scan 10x     ")(force(repTwoScan(s"$out/d10")))
    t("rep 1scan 20x     ")(force(graft.ops.Repetition.repetitionSignals(spark, out)))
    t("rep 2scan 20x     ")(force(repTwoScan(out)))

    // the composed training-shards pipeline (the one artifact a
    // training run actually ships) at 10× and 20× documents, with its
    // dominant stages broken out so a superlinear stage can't hide in
    // the composed wall-clock: governance (LSH dedup ∘ decontaminate)
    // and quality are the survivor-set producers the composition
    // semi-joins against; pack is the prefix-sum + payload concat.
    t("governed 10x      ")(force(graft.ops.Decontaminate.governedCorpus(spark, s"$out/d10")))
    t("quality 10x       ")(force(graft.ops.TextStats.qualityFiltered(spark, s"$out/d10")))
    t("train shards 10x  ")(force(graft.ops.Corpus.trainingShards(spark, s"$out/d10")))
    t("shards mixed 10x  ")(force(graft.ops.Corpus.trainingShardsMixed(spark, s"$out/d10")))
    t("governed 20x      ")(force(graft.ops.Decontaminate.governedCorpus(spark, out)))
    t("quality 20x       ")(force(graft.ops.TextStats.qualityFiltered(spark, out)))
    t("train shards 20x  ")(force(graft.ops.Corpus.trainingShards(spark, out)))
    t("shards mixed 20x  ")(force(graft.ops.Corpus.trainingShardsMixed(spark, out)))
    t("shards chunked 10x")(force(graft.ops.Corpus.trainingShardsChunked(spark, s"$out/d10")))
    t("shards chunked 20x")(force(graft.ops.Corpus.trainingShardsChunked(spark, out)))

    // embeddings at 20× (40k vectors): SemDeDup under the auto-scaled
    // cell count (occupancy held flat — the knob that keeps the
    // within-cell pair join linear overall; a FIXED cell count was
    // measured degrading toward all-pairs here)
    t("build 40k embeds  ")(xN(graft.core.Tables.embeddings(spark, dir), "vec_id", 20)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet"))
    t("semantic dedup 40k")(force(
      graft.ops.Similarity.semanticDedupClusters(spark, out)))

    // embeddings at 100× (200k vectors, k = 4·√n ≈ 1789 cells): the
    // two-level probe's home turf — the n·k single-level assignment
    // term vs the n·(√k + wc·√k) two-level one, then the full SemDeDup
    // flow with the auto-selected two-level assignment (k ≥ 512)
    t("build 200k embeds ")(xN(graft.core.Tables.embeddings(spark, dir), "vec_id", 100)
      .write.mode("overwrite").parquet(s"$out/e100/embeddings.parquet"))
    locally {
      val corpus = graft.ops.Similarity.normalized(spark, s"$out/e100").cache()
      val k = math.min(4096, math.max(16,
        (4 * math.sqrt(corpus.count().toDouble)).toLong)).toInt
      var cents: DataFrame = null
      t(s"centroids k=$k    ")(
        { cents = graft.ops.Similarity.ivfCentroidsDf(corpus, k).localCheckpoint() })
      t("assign 1level 200k")(force(
        graft.ops.Similarity.assignCells(corpus, cents, nprobe = 4)))
      t("assign 2level 200k")(force(
        graft.ops.Similarity.assignCellsTwoLevel(corpus, cents, nprobe = 4)))
      corpus.unpersist()
    }
    t("semantic dedup 200k")(force(
      graft.ops.Similarity.semanticDedupClusters(spark, s"$out/e100")))

    // streaming throughput at 10M events: paced file stream through the
    // reference-shaped stateful aggregate into a memory sink
    t("stream agg 10M    ") {
      val chunkDir = java.nio.file.Files
        .createTempDirectory("graft-stress100-stream").toString
      graft.core.Tables.events(spark, out).repartition(16)
        .write.mode("overwrite").parquet(chunkDir)
      val s0 = System.nanoTime()
      val agg = graft.streaming.StreamAggregator.dailyAggExact(
        graft.streaming.StreamAggregator.replayStream(spark, chunkDir,
          maxFilesPerTrigger = Some(4)))
      val q = agg.writeStream
        .outputMode("complete").format("memory").queryName("stress100_stream")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft-stress100-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - s0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      println(f"[stress100] stream: ${10000000 / sec / 1000}%.0fk rows/s over $batches batches")
    }
    spark.stop()
  }
}
