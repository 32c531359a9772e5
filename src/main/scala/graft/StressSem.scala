package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Components, Similarity}

/** SemDeDup scale attribution up to 1M vectors — the follow-up to the
  * r7 finding that the k-means BUILD term was the 200k bottleneck:
  * with the build solved (54.8 s), the next superlinear candidates
  * are (a) identical-vector cliques in the within-cell pair join
  * (m copies of one vector are m²/2 pairs in every probed cell) and
  * (b) the Θ(n^1.5) candidate volume itself once n hits 10⁶. This
  * harness times each stage of [[Similarity.semanticDedupClusters]]
  * separately and prints pair VOLUMES, over two corpus shapes:
  *
  *  - `dup`: plain replication — every vector has m exact copies,
  *    the worst-case clique input that the exact-duplicate collapse
  *    must neutralize (post-collapse the rep corpus is the 2k base).
  *  - `flip`: seeded sign-flip replication — each copy's embedding
  *    has a per-rep deterministic sign pattern applied, which
  *    preserves the norm but decorrelates copies, so the corpus has
  *    n DISTINCT vectors and the collapse is an honest no-op. This
  *    is the shape that exercises true n-scale: cells ≈ 4√n,
  *    occupancy ≈ √n·nprobe/4, pair volume Θ(n^1.5).
  *
  * Run: `sbt "runMain graft.StressSem [dup|flip:mult ...]"`
  * (default: dup:100 flip:100 flip:500 = the r7 200k worst case,
  * the comparable 200k distinct case, and the 1M target).
  */
object StressSem {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val cases = (if (args.nonEmpty) args.toSeq
      else Seq("dup:100", "flip:100", "flip:500"))
      .map { c =>
        // the doc brackets :m as optional ("scr[:m[:cells]]") — a bare
        // mode must not crash, and a typo'd number dies with usage,
        // not a NumberFormatException stack
        val parts = c.split(":")
        def num(i: Int, default: Int): Int =
          if (parts.length > i)
            parts(i).trim.toIntOption.getOrElse(sys.error(
              s"StressSem: bad number in '$c' — usage flavor[:m[:cells]]"))
          else default
        (parts(0), num(1, 100), num(2, 0))
      }

    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stresssem] $l ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    for ((style0, m, cellsOverride) <- cases) {
      // Styles. Corpus FLAVORS (what the m replicas of each base
      // vector look like):
      //  - "dup":  exact copies — the collapseExact regime;
      //  - "flip": per-rep sign patterns — fully decorrelated
      //    DISTINCT vectors, honest n-scale, no duplicate regime;
      //  - "near": per-rep blend with the reversed vector
      //    (cos ≳ 1−10⁻⁴·rep) — distinct vectors in m-size
      //    NEAR-dup cliques: collapseExact cannot fold them, the
      //    pairwise verify pays m²/2 per clique, the screen folds
      //    them at gap 0. The regime the screened hybrid exists for.
      // MODES: bare flavor = the full staged pairwise suite (+ screen
      // + hybrid e2e rows); "scr[:m[:cells]]" = screen stages only on
      // the flip corpus (the only tractable mode at 10M — <cells>
      // forces the cell count so the k-cap occupancy regime is
      // measurable early); "hyb"/"hybnear"/"hybdup" = hybrid e2e only
      // on the flip/near/dup corpus. All modes build their corpus if
      // missing.
      val flavor = style0 match {
        case "scr" | "hyb" => "flip"
        case "hybnear" => "near"
        case "hybdup" => "dup"
        case s => s
      }
      val fullSuite = Set("dup", "flip", "near")(style0)
      val out = s"/tmp/stresssem_${flavor}_x$m"
      val n = 2000L * m
      println(s"[stresssem] ===== $style0 x$m = ${n / 1000}k vectors" +
        (if (cellsOverride > 0) s" cells=$cellsOverride" else "") +
        " =====")
      def buildCorpus(): Unit = {
        val base = graft.core.Tables.embeddings(spark, dir)
          .crossJoin(spark.range(m).toDF("rep"))
          .withColumn("vec_id", col("vec_id") + col("rep") * 1000000000L)
        val replicated = flavor match {
          case "dup" => base.drop("rep")
          case "near" => base.withColumn("embedding",
              // distinct per rep, cosine to the base ≳ 1−10⁻⁴·rep —
              // the planted-near-copy construction of the centroid
              // gate, scaled to m-size cliques
              expr("""zip_with(embedding, reverse(embedding),
                       (x, y) -> CAST(x + rep * 0.0001D * y AS FLOAT))"""))
            .drop("rep")
          case _ => base.withColumn("embedding",
              // per-rep sign pattern from xxhash64(rep): norm-
              // preserving, deterministic, distinct w.h.p. across
              // reps — distinct VECTORS at full n
              expr("""transform(embedding, (x, i) ->
                       IF((shiftright(xxhash64(rep), pmod(i, 63)) & 1) = 1,
                          -x, x))"""))
            .drop("rep")
        }
        t(f"build ${n / 1000}%5dk embeds")(replicated
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet"))
      }
      if (!new java.io.File(s"$out/embeddings.parquet/_SUCCESS").exists())
        buildCorpus()
      if (style0.startsWith("hyb")) {
        val clusters = t("HYBRID screened e2e")(
          Similarity.semanticDedupClustersScreened(spark, out)
            .localCheckpoint())
        println(s"[stresssem] hybrid clusters    " +
          s"${clusters.select("cluster").distinct().count()}")
      }
      if (fullSuite) {

      // the stages of semanticDedupClusters, timed separately (same
      // defaults: tau=0.4, nprobe=4, auto cells, 2 Lloyd rounds)
      val corpusAll = Similarity.normalized(spark, out).cache()
      t("normalize + count  ")(corpusAll.count())
      val (corpus, stars) = t("exact collapse     ") {
        // MIRROR of the shipped collapse (Similarity.scala, 128-bit
        // content hash): the group-by and star join must move the
        // 16-byte key, never the dim·8-byte vector, or this stage
        // times a ~32×-heavier exchange than the one it attributes
        val vhash = struct(xxhash64(col("vec")).as("h1"),
          xxhash64(lit("graft:vhash2"), col("vec")).as("h2"))
        val hashed = corpusAll.select(col("vec_id"), vhash.as("vh"))
        val reps = hashed.groupBy("vh").agg(min("vec_id").as("rep_id"))
        val c = corpusAll.join(reps.select(col("rep_id").as("vec_id")),
          Seq("vec_id"), "left_semi").localCheckpoint()
        val st = hashed
          .join(reps, "vh")
          .where(col("vec_id") =!= col("rep_id"))
          .select(col("rep_id").as("src"), col("vec_id").as("dst"))
          .localCheckpoint()
        (c, st)
      }
      val count = corpus.count()
      println(s"[stresssem] distinct vectors   $count")
      val k = math.min(4096, math.max(16,
        (4 * math.sqrt(count.toDouble)).toLong)).toInt
      val cents = t(s"centroids k=$k ")(
        Similarity.ivfCentroidsDf(corpus, k, iters = 2).localCheckpoint())
      val buckets = t("assign 2level      ")(
        (if (k >= 512) Similarity.assignCellsTwoLevel(corpus, cents, 4)
         else Similarity.assignCells(corpus, cents, 4))
          .localCheckpoint())
      // pair verification INSIDE the cell join (the shipped shape):
      // vectors ride one cell-keyed exchange, each pair's dot runs
      // exactly once, at its smallest shared probe cell
      val pairs = t("pair verify in-join") {
        val probes = buckets.groupBy("vec_id")
          .agg(sort_array(collect_list(col("cell"))).as("cells"))
          .join(corpus.select("vec_id", "vec"), "vec_id")
        val sided = probes.select(col("vec_id"), col("vec"), col("cells"),
          explode(col("cells")).as("cell"))
        sided.as("a")
          .join(sided.as("b"),
            col("a.cell") === col("b.cell") &&
              col("a.vec_id") < col("b.vec_id"))
          .where(col("a.cell") ===
              array_min(array_intersect(col("a.cells"), col("b.cells"))) &&
            graft.functions.VectorFunctions
              .dot(col("a.vec"), col("b.vec")) >= 0.4)
          .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
          .localCheckpoint()
      }
      println(s"[stresssem] verified pairs     ${pairs.count()}")
      t("connected comps    ")(
        Components.connectedComponents(
            corpusAll.select(col("vec_id").as("node")),
            pairs.unionByName(stars))
          .write.mode("overwrite").format("noop").save())
      corpusAll.unpersist()

      // the composed flow end to end — the number SCALE.md quotes
      t("FULL semantic dedup")(
        Similarity.semanticDedupClusters(spark, out)
          .write.mode("overwrite").format("noop").save())

      // the Θ(n) centroid screen on the same corpus — the SemDeDup-
      // paper variant: no pairwise term, so this is the row that
      // should stay near-linear where pair verify goes n^1.5
      t("CENTROID screen    ")(
        Similarity.semanticDedupCentroid(spark, out)
          .write.mode("overwrite").format("noop").save())

      // the screen-first hybrid on the same corpus — near-pairwise
      // cost on distinct corpora (screen drops nothing, survivors =
      // everyone), near-screen cost on clique-heavy ones (cliques
      // fold before the pair join)
      t("HYBRID screened e2e")(
        Similarity.semanticDedupClustersScreened(spark, out)
          .write.mode("overwrite").format("noop").save())
      } // fullSuite

      // stage attribution for the screen (mirrors the operator's
      // internals the same way the pairwise stages above mirror
      // semanticDedupClusters — when a composed number surprises,
      // the per-stage rows say which term moved)
      if (!style0.startsWith("hyb")) {
        val c2 = Similarity.normalized(spark, out)
          .select("vec_id", "vec").cache()
        val n2 = t("scr normalize+count")(c2.count())
        val k2 = if (cellsOverride > 0) cellsOverride
          else math.min(4096, math.max(16,
            math.sqrt(n2.toDouble).toLong)).toInt
        val cents2 = t(f"scr centroids k=$k2%-4d")(
          Similarity.ivfCentroidsDf(c2, k2, iters = 2).localCheckpoint())
        val asg = t("scr best-cell pass ") {
          val arr = cents2
            .agg(collect_list(struct(col("cid"), col("cvec"))).as("cc"))
          c2.crossJoin(broadcast(arr))
            .select(col("vec_id"),
              graft.functions.VectorFunctions
                .bestCell(col("vec"), col("cc")).as("b"))
            .select(col("vec_id"), col("b.cid").as("cell"),
              col("b.sim").as("sim")).localCheckpoint()
        }
        t("scr windows        ") {
          import org.apache.spark.sql.expressions.Window
          val scored = asg
          val w = Window.partitionBy("cell")
            .orderBy(col("sim").desc, col("vec_id"))
          scored
            .withColumn("gap", lag(col("sim"), 1).over(w) - col("sim"))
            .withColumn("newg",
              when(col("gap").isNull || col("gap") > 5e-4, 1L)
                .otherwise(0L))
            .withColumn("grp", sum("newg").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .withColumn("cluster", min("vec_id")
              .over(Window.partitionBy("cell", "grp")))
            .select("vec_id", "cluster")
            .write.mode("overwrite").format("noop").save()
        }
        c2.unpersist()
        // the REGISTERED operator end to end — the number SCALE.md
        // quotes for the screen
        t("CENTROID screen e2e")(
          Similarity.semanticDedupCentroid(spark, out,
              cells = cellsOverride)
            .write.mode("overwrite").format("noop").save())
        ()
      }
    }
    spark.stop()
  }
}
