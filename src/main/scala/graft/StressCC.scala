package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Components

/** Connected-components memory A/B at the 1M-SemDeDup edge volume —
  * the follow-up to the SCALE.md finding that CC at 24M edges was the
  * memory-pressure stage of the 1M flow (8 GB heap OOMed; 48 GB
  * cleared it). Hypothesis: the ceiling was not the working set but
  * RETENTION — every iteration localCheckpoints a full label table
  * and the superseded iterations' blocks stay pinned in the block
  * manager until GC + ContextCleaner catch up, so peak storage is
  * iterations × labels instead of 2 × labels.
  *
  * The harness runs [[Components.connectedComponents]] (which now
  * frees superseded checkpoints eagerly) and, for the A/B, a
  * measurement-only copy of the PRE-FIX loop (`ccRetaining` below —
  * same joins, same checkpoints, no frees) on the same synthetic
  * graph: n nodes, e hash-random edges (deterministic xxhash64
  * endpoints, avg degree 2e/n ≈ 48 at the default shape, one giant
  * component — the post-verify pair volume of the 1M flow). Run each
  * arm in its OWN JVM at a fixed heap to make OOM-vs-pass the
  * observable:
  *
  *   java -Xmx8g -cp "target/scala-2.13/classes:<spark jars dir glob>" \
  *     graft.StressCC fixed 1000000 24000000
  *   java -Xmx8g -cp ... graft.StressCC retaining 1000000 24000000
  *
  * Both arms print the same label checksum, so the A/B also asserts
  * output invariance of the fix.
  */
object StressCC {

  /** The pre-fix loop, verbatim minus the eager frees — kept ONLY as
    * the baseline arm of this measurement (the library path is
    * [[Components.connectedComponents]]). */
  private def ccRetaining(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("component"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"),
          col("component").as("nbr_comp")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min("nbr_comp").as("nbr_comp"))
      val adopted = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"),
            coalesce(col("nbr_comp"), col("component"))).as("component"),
          col("component").as("old"))
      val jumped = adopted
        .join(adopted.select(col("node").as("component"),
          col("component").as("parent")), Seq("component"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("parent"), col("component")))
            .as("component"),
          col("old"))
        .localCheckpoint()
      changed = jumped.where(col("component") =!= col("old")).count()
      labels = jumped.select("node", "component")
      iter += 1
    }
    labels
  }

  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("fixed")
    val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val e = args.lift(2).map(_.toLong).getOrElse(24000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[stresscc] arm=$arm n=$n e=$e " +
      s"heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}m")
    val nodes = spark.range(n).select(col("id").as("node"))
    // "paths": n nodes in n/L disjoint chains of length L = arg3 —
    // the HIGH-DIAMETER regime the pre-r9 loop silently failed in
    // (maxIter hit before labels crossed the diameter). Ground truth
    // is analytic: component of node i = i - i % L, so label_sum and
    // n_components verify the run, not just time it. The hash-random
    // arms have diameter O(log n); this one has diameter L, forcing
    // the 3-jumps-per-round loop to prove its O(log L) convergence
    // at a wall-clock the verdict asked to see measured.
    val edges = arm match {
      case "paths" =>
        val len = math.max(2L, e) // arg3 = chain length here
        // the analytic truth below assumes whole chains: a
        // non-dividing length leaves a partial tail chain (and the
        // degenerate default e=24M > n is one n-long path), so the
        // expected label_sum/count formulas would spuriously MISMATCH
        require(len <= n && n % len == 0,
          s"paths arm: chain length $len must divide n=$n " +
            "(usage: StressCC paths <n> <chainLength>)")
        spark.range(n).where(pmod(col("id"), lit(len)) =!= (len - 1) &&
            col("id") < n - 1)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
      case _ => spark.range(e).select(
        pmod(xxhash64(col("id"), lit("src")), lit(n)).as("src"),
        pmod(xxhash64(col("id"), lit("dst")), lit(n)).as("dst"))
    }
    val t0 = System.nanoTime()
    val labels = arm match {
      case "retaining" => ccRetaining(nodes, edges)
      // paths: force the distributed loop even under the 4M-edge
      // threshold — the loop IS the system under test
      case "paths" => Components.connectedComponents(nodes, edges,
        smallGraphEdges = 0L)
      case _ => Components.connectedComponents(nodes, edges)
    }
    val sums = labels.agg(
      sum("component").as("label_sum"),
      countDistinct("component").as("n_components")).head()
    println(f"[stresscc] $arm done ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"label_sum=${sums.getLong(0)} components=${sums.getLong(1)}")
    if (arm == "paths") {
      val len = math.max(2L, e)
      val chains = n / len
      val expSum = (0L until chains).map(c => c * len * len).sum
      val ok = sums.getLong(0) == expSum && sums.getLong(1) == chains
      println(s"[stresscc] paths expected label_sum=$expSum " +
        s"components=$chains -> ${if (ok) "MATCH" else "MISMATCH"}")
      require(ok, "paths arm: labels diverge from the analytic truth")
    }
    spark.stop()
  }
}
