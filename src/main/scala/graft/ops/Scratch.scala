package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped scratch directories for gate queries that BUILD a
  * persisted artifact (IVF-PQ index, BM25 index) before probing it.
  *
  * Two problems this solves at once:
  *  - **Double builds**: `q_ann_ivfpq` and `q_ann_ivfpq_recall` both
  *    probe the same scratch index; without a cache each gate re-ran
  *    the full k-means + PQ train + partitioned write (~15% of the
  *    sf0.1 bench). The build now runs ONCE per (session, key) — its
  *    cost stays visible in whichever gate touches it first, and the
  *    recall row measures the probe, not a second identical build.
  *  - **Temp-dir leaks**: every invocation used to mint a fresh
  *    `createTempDirectory` with no cleanup, accumulating full index
  *    copies under /tmp across driver/bench/recall runs. Cached dirs
  *    are deleted by a JVM shutdown hook.
  *
  * Keys include the Spark application id, so a fresh session (a new
  * driver run, a new bench) rebuilds from scratch — caching never
  * crosses a process boundary, and correctness never depends on it:
  * the cache only collapses REPEATS of a deterministic build inside
  * one JVM. A failed build stores nothing (computeIfAbsent drops the
  * mapping when the builder throws), so a retry rebuilds cleanly. */
object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** The scratch path for `key`, building it via `build` on first use
    * in this session. `build` receives the path to populate; the
    * returned path is the populated artifact. */
  def cached(spark: SparkSession, key: String, prefix: String)(
      build: String => Unit): String = {
    val fullKey = spark.sparkContext.applicationId + ":" + key
    dirs.computeIfAbsent(fullKey, { _ =>
      if (hooked.compareAndSet(false, true))
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          dirs.values.forEach { d =>
            // the cached path is <tmpbase>/index — remove the whole
            // temp base the gate minted
            deleteRecursively(new java.io.File(d).getParentFile)
          }))
      val base = java.nio.file.Files.createTempDirectory(prefix)
      val path = base.toString + "/index"
      build(path)
      path
    })
  }

  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Session-scoped memo for SMALL deterministic gate results — the
    * [[cached]] discipline applied to a DataFrame instead of a
    * directory. The recall gates re-run their approximate query AND
    * the exact brute-force twin that several gates share; each repeat
    * re-pays codebook training / a full-corpus scoring scan to
    * reproduce a result that is deterministic within the session.
    * `computeIfAbsent` + `localCheckpoint` collapses those repeats to
    * one materialization pinned in executor storage.
    *
    * Only memoize results that are (a) bounded — gate top-k lists and
    * recall instruments, O(queries·k) rows, never corpus-sized — and
    * (b) deterministic within one session (seeded builds qualify: the
    * partition-layout float caveat on Lloyd means cross-SESSION runs
    * may differ in the last ulp, but a repeat inside one session is
    * identical by construction, so caching changes nothing a driver
    * gate can observe). Keyed by application id like [[cached]]:
    * fresh process, fresh compute. */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    frames.computeIfAbsent(
      spark.sparkContext.applicationId + ":" + key, _ => build.localCheckpoint())
}
