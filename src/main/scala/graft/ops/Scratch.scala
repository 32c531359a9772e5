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
  * one JVM. A failed build stores nothing (the builder runs OUTSIDE
  * the map and only a successful result is published), so a retry
  * rebuilds cleanly.
  *
  * Concurrency: lookups deliberately do NOT use `computeIfAbsent` —
  * several builds are REENTRANT on these maps (the delete-gate index
  * copies the shared gate index, the survivor memo builds through the
  * components memo), and the JDK contract forbids a mapping function
  * from touching its own map mid-computation: when two keys land in
  * one hash bin that can livelock or corrupt the bin. Instead: check,
  * build outside the map, publish with `putIfAbsent`. Builds are
  * deterministic, so the rare lost race just discards an identical
  * duplicate (the loser's temp dir / checkpoint blocks are released
  * on the spot). */
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
    val hit = dirs.get(fullKey)
    if (hit != null) return hit
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.values.forEach { d =>
          // the cached path is <tmpbase>/index — remove the whole
          // temp base the gate minted
          deleteRecursively(new java.io.File(d).getParentFile)
        }))
    val base = java.nio.file.Files.createTempDirectory(prefix)
    val path = base.toString + "/index"
    // a FAILED build must not leak its partial index: the dir is not
    // yet registered in `dirs`, so the shutdown hook cannot reach it —
    // clean up before rethrowing (a retry then rebuilds cleanly)
    try build(path)
    catch { case e: Throwable =>
      deleteRecursively(base.toFile)
      throw e
    }
    val prior = dirs.putIfAbsent(fullKey, path)
    if (prior != null) {
      // lost a race to an identical build — drop the duplicate
      deleteRecursively(base.toFile)
      prior
    } else path
  }

  // Retention scope: entries are keyed by applicationId and never
  // evicted — right for this library's one-session-per-JVM processes
  // (Bench/Verify/RunOne/driver), where the maps die with the JVM. A
  // host embedding MANY short-lived sessions in one JVM would retain
  // each stopped session's memo frames (which pin their SparkSession
  // graph) and cached dirs until exit; such a host should clear via
  // its own lifecycle hooks rather than this library guessing one.
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
    * recall instruments, O(queries·k) rows — and
    * (b) deterministic within one session (seeded builds qualify: the
    * partition-layout float caveat on Lloyd means cross-SESSION runs
    * may differ in the last ulp, but a repeat inside one session is
    * identical by construction, so caching changes nothing a driver
    * gate can observe). Keyed by application id like [[cached]]:
    * fresh process, fresh compute.
    *
    * ONE sanctioned exception to the bounded rule: the near-dup
    * component labels ([[Components.nearDupComponents]] `memo=true`)
    * are one (doc_id, component) row PER DOCUMENT — but two longs per
    * doc (16 bytes; ~16 GB spread across a cluster at 10⁹ docs,
    * ~0.00002% of the corpus it labels), stored MEMORY_AND_DISK by
    * `localCheckpoint` so memory pressure spills it rather than
    * evicting work, and it is exactly the artifact a production
    * pipeline materializes once (the component-label table) before
    * deriving survivors / clean corpus / governance from it. Anything
    * larger — text, vectors, pair lists — stays out. */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val fullKey = spark.sparkContext.applicationId + ":" + key
    val hit = frames.get(fullKey)
    if (hit != null) return hit
    val built = build.localCheckpoint()
    val prior = frames.putIfAbsent(fullKey, built)
    if (prior != null) {
      // lost a race to an identical build — free the duplicate blocks
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(built)
      prior
    } else built
  }
}
