package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Quantize

/** Stale-vs-fresh recall curves for frozen-structure IVF-PQ indexes —
  * the r9 verdict ask: `appendToIvfPqIndex` freezes cells/codebooks
  * and `IngestEmbed` freezes first-batch centroids, with drift
  * handled by "periodic rebuild" that no number backed. This harness
  * prints stale-vs-fresh recall after b = 1..B appends of
  * progressively shifted data ([[Quantize.driftedBatch]]: shift
  * strength b·alpha toward a fixed direction) at a configurable
  * probe budget, so the maintenance policy is MEASURED (SCALE.md
  * round-10). What the measurement actually showed: at production
  * cell counts (√n cells, O(10) probes) the probe BUDGET binds, not
  * staleness — stale recall stays flat-to-rising under uniform-pull
  * drift and a rebuild at fixed nprobe can lose recall by
  * re-balancing cells onto the dense drifted cluster; the
  * staleness-binding regime (where `q_ann_ivfpq_drift` gates) is
  * high probe coverage. See [[Quantize.ivfPqDriftRecall]]'s regime
  * caveat.
  *
  * Run: `sbt "runMain graft.StressDrift [mult] [maxBatches] [alpha]
  * [nprobe]"` (default 10 ⇒ 20k base vectors from sf0.1 ×10
  * sign-flip replication — the StressSem decorrelated-copy
  * construction — 6 batches, alpha 0.15, nprobe 14).
  */
object StressDrift {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val maxB = args.lift(1).map(_.toInt).getOrElse(6)
    val alpha = args.lift(2).map(_.toDouble).getOrElse(0.15)
    val nprobeArg = args.lift(3).map(_.toInt).getOrElse(14)
    val dir = "/root/testdata/sf0.1"

    // decorrelated replication (the StressSem flip construction):
    // distinct vectors at n = 2000·mult, so ground truth is honest
    val base = graft.core.Tables.embeddings(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .withColumn("vec_id", col("vec_id") + col("rep") * 1000000000L)
      .withColumn("embedding",
        expr("""transform(embedding, (x, i) ->
                 IF((shiftright(xxhash64(rep), pmod(i, 63)) & 1) = 1,
                    -x, x))"""))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.normalize(
          graft.functions.VectorFunctions.toDoubleVec(col("embedding")))
          .as("vec"))
      .localCheckpoint()
    val n = base.count()
    // cells scale like the ANN path would provision them: √n
    val cells = math.max(16,
      math.round(math.sqrt(n.toDouble)).toInt)
    // arg 4 sweeps the probe budget — the dominant recall term this
    // harness exposed in round 10; ≤ 0 resolves the production
    // auto-tune ([[graft.ops.Similarity.nprobeAuto]]: ⌈3.5·√cells⌉,
    // the budget that round's sweep showed recovers the fixed-14 sag)
    val nprobe = if (nprobeArg > 0) nprobeArg
      else graft.ops.Similarity.nprobeAuto(cells)
    println(s"[drift] base=$n vectors, cells=$cells, alpha=$alpha, " +
      s"queries=50, k=10, nprobe=$nprobe" +
      (if (nprobeArg <= 0) " (auto)" else ""))
    for (b <- 1 to maxB) {
      val t0 = System.nanoTime()
      val (stale, fresh, nTrue) = Quantize.ivfPqDriftCounts(spark, base,
        s"stress$mult:np$nprobe", b, alpha, numQueries = 50, k = 10,
        cells = cells, nprobe = nprobe, rerank = 20)
      println(f"[drift] batches=$b shift=${b * alpha}%.2f  " +
        f"stale=${stale.toDouble / nTrue}%.3f  " +
        f"fresh=${fresh.toDouble / nTrue}%.3f  " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
