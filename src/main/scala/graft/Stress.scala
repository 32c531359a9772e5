package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = "/tmp/stress10x"
    def x10(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _)
    spark.conf.set("spark.sql.parquet.outputTimestampType","TIMESTAMP_MICROS")
    // build 10x tables once
    x10(graft.core.Tables.lineitem(spark, dir), "l_orderkey", 10).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    x10(graft.core.Tables.orders(spark, dir), "o_orderkey", 10).write.mode("overwrite").parquet(s"$out/orders.parquet")
    // on-disk contract: ts is the raw nanos long column
    x10(graft.core.Tables.events(spark, dir), "event_id", 10)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    for (t <- Seq("customer","nation","region","supplier","part")) 
      graft.core.Tables.load(spark, dir, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    x10(graft.core.Tables.documents(spark, dir), "doc_id", 4).write.mode("overwrite").parquet(s"$out/documents.parquet")
    x10(graft.core.Tables.embeddings(spark, dir).withColumnRenamed("vec_id","v"), "v", 5)
      .withColumnRenamed("v","vec_id").select("vec_id","embedding","label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println("[stress] built 10x: lineitem=6M orders=1.5M events=1M docs=20k embeddings=10k")
    def t(l: String)(f: => Unit): Unit = { val t0=System.nanoTime()
      try { f; println(f"[stress] $l ${(System.nanoTime()-t0)/1e9}%.1f s") }
      catch { case e: Throwable => println(s"[stress] $l FAILED: ${e.getMessage.take(200)}") } }
    def force(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
    t("q1 6M rows        ")(force(graft.engine.Relational.q1PricingSummary(spark, out)))
    t("join 6Mx1.5M      ")(force(graft.engine.Relational.revenueByPriority(spark, out)))
    t("argmax 1.5M       ")(force(graft.engine.Relational.latestBestOrderPerCustomer(spark, out)))
    t("minhash+lsh 20k docs")(force(graft.ops.Dedup.minhashLshPairs(spark, out)))
    t("simhash 20k docs  ")(force(graft.ops.Dedup.simhashPairs(spark, out)))
    t("ngram exact 20k   ")(force(graft.ops.Dedup.ngramJaccardPairs(spark, out)))
    t("ann topk 10k vecs ")(force(graft.ops.Similarity.bruteForceTopK(spark, out)))
    t("lsh neardup 10k   ")(force(graft.ops.Similarity.lshNearDupPairs(spark, out)))
    t("asof 1Mx1.5M      ")(force(graft.plans.AsOfJoin.eventsWithLatestOrder(spark, out)))
    t("sessions 1M       ")(force(graft.streaming.Sessionize.sessionsQuery(spark, out)))
    t("cc clusters 20k   ")(force(graft.ops.Components.lshDedupClusters(spark, out)))
    t("pack shards 20k   ")(force(graft.ops.Pack.packDocs(spark, out)))
    t("top terms 20k     ")(force(graft.ops.Terms.topTermsPerDoc(spark, out)))
    t("split leakage 20k ")(force(graft.ops.Mix.crossSplitLeakage(spark, out)))
    t("novelty 20k docs  ")(force(graft.ops.TextStats.noveltyScores(spark, out)))
    t("redact 20k docs   ")(force(graft.ops.Redact.redactDocs(spark, out)))
    t("dedup incr 20k    ")(force(graft.ops.Dedup.dedupIncremental(spark, out)))
    t("funnel 1M events  ")(force(graft.engine.Relational.signupFunnel(spark, out)))
    t("trailing 1.5M     ")(force(graft.engine.Windows.trailingSpend(spark, out)))
    t("profile exact 1.5M")(force(graft.ops.Profile.profile(
      graft.core.Tables.orders(spark, out))))
    t("profile hll 1.5M  ")(force(graft.ops.Profile.profile(
      graft.core.Tables.orders(spark, out), exact = false)))
    spark.stop()
  }
}
