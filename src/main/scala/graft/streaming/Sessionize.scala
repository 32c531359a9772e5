package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Tables

/** Custom stateful streaming: gap-based sessionization per user with
  * `flatMapGroupsWithState` — the §2.9 extension for state Spark's
  * built-in windowed aggregates can't express (a session ends only
  * when the user goes quiet, so window bounds depend on the data).
  *
  * State design for scale: one small fixed-size state record per
  * active user (no event buffering — the session aggregates fold
  * incrementally), event-time timeout evicts idle users, so state size
  * tracks concurrently-active users, not history. RocksDB state store
  * drops in via config unchanged.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session state: bounds + incremental aggregates. Timestamps
    * are stored as-is (not epoch millis) to keep microsecond precision —
    * `Timestamp.getTime` truncates to ms, which silently breaks
    * equality with any batch-computed session bound. */
  case class SessionState(start: Timestamp, lastSeen: Timestamp,
      nEvents: Long, sumValue: Double)

  /** A closed session. */
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  val gapMs: Long = 30 * 60 * 1000L

  /** Fold a user's new events into the open session, emitting sessions
    * that closed (gap exceeded between consecutive events, or state
    * timeout fired).
    *
    * LATE events (admitted by the 1 h watermark, which is wider than
    * the 30 min gap) may precede the open session and are folded by
    * POSITION against its [start, lastSeen] span, matching the batch
    * oracle: within-gap-after extends the end, inside-span only adds
    * to the aggregates, within-gap-before extends the START backwards
    * (never the end — the naive `gap <= gapMs` fold accepts every
    * negative gap and walks lastSeen backwards, inverting bounds),
    * and a batch of events all > gap BEFORE the span forms its own
    * earlier chain, emitted as a completed session while the open one
    * is parked. Residual (inherent to one-open-session state): an
    * earlier chain is closed in the batch that delivers it, so MORE
    * late events for that same chain in a LATER batch would start a
    * fresh session instead of extending the emitted one. */
  def updateUser(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start, s.lastSeen, s.nEvents, s.sumValue))
    } else {
      // full-precision order: getTime truncates to ms, so sub-ms
      // siblings would sort by arrival, not time (the file's own
      // microsecond contract); gap ARITHMETIC stays ms-grain to match
      // the oracle's unix_millis/epoch_ms comparisons exactly
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
      def minTs(a: Timestamp, b: Timestamp) =
        if (a.compareTo(b) <= 0) a else b
      def maxTs(a: Timestamp, b: Timestamp) =
        if (a.compareTo(b) >= 0) a else b
      var closed = List.empty[Session]
      def close(s: SessionState): Unit =
        closed ::= Session(userId, s.start, s.lastSeen, s.nEvents,
          s.sumValue)
      // the open session restored from state may lie AHEAD of late
      // events in this batch: park it, run the batch chronologically,
      // reconcile when the timeline reaches its merge zone
      var parked = state.getOption
      var cur: Option[SessionState] = None
      sorted.foreach { e =>
        parked.foreach { p =>
          if (e.ts.getTime >= p.start.getTime - gapMs) {
            cur match {
              case Some(c) if p.start.getTime - c.lastSeen.getTime <= gapMs =>
                // the early chain grew into the parked span: one session
                cur = Some(SessionState(minTs(c.start, p.start),
                  maxTs(c.lastSeen, p.lastSeen),
                  c.nEvents + p.nEvents, c.sumValue + p.sumValue))
              case Some(c) =>
                close(c); cur = Some(p)
              case None => cur = Some(p)
            }
            parked = None
          }
        }
        cur match {
          case Some(c)
              if e.ts.getTime - c.lastSeen.getTime <= gapMs &&
                c.start.getTime - e.ts.getTime <= gapMs =>
            // within gap of the span (before, inside or after): one
            // session with min/max bounds. Once parked is reconciled
            // every later event sits within-or-after the early edge,
            // so the before-by->gap case below only fires pre-merge
            cur = Some(SessionState(minTs(c.start, e.ts),
              maxTs(c.lastSeen, e.ts), c.nEvents + 1,
              c.sumValue + e.value))
          case Some(c) =>
            close(c)
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        }
      }
      // batch ended entirely > gap before the parked span: the early
      // chain can never reach it — emit the chain, keep the open one
      parked.foreach { p => cur.foreach(close); cur = Some(p) }
      cur.foreach { s =>
        state.update(s)
        // evict once the watermark passes the session gap. Never below
        // the current watermark: an un-reconciled parked span starts
        // > gap after a ≥-watermark event, and a reconciled one ends
        // ≥ the batch's (≥-watermark) last event — both put
        // lastSeen + gap above the watermark
        state.setTimeoutTimestamp(s.lastSeen.getTime + gapMs)
      }
      closed.reverseIterator
    }
  }

  /** Streaming sessionization: events → per-user gap sessions.
    * Watermark bounds how late events may arrive; state times out on
    * event time. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateUser)
  }

  /** Batch oracle for the same semantics: classic gap-based session
    * assignment with a lag/cumsum window — used by tests to check the
    * streaming path (and itself a useful batch operator). */
  def sessionsBatch(spark: SparkSession, dir: String): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val sessionized = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs,
          1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessionized
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .drop("session_id")
      .as[Session]
  }

  /** Oracle form of [[sessionsBatch]]: engine-deterministic sum (exact
    * decimal sum instead of order-dependent double) over the same
    * gap-session assignment. */
  def sessionsQuery(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs,
          1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,2)")).cast("double")
          .as("sum_value"))
      .drop("session_id")
  }

  val sessionsSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (SELECT user_id, ts, value,
      |        CASE WHEN lag(ts) OVER w IS NULL
      |               OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |             THEN 1 ELSE 0 END AS ns
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |y AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
      |FROM y GROUP BY user_id, sid""".stripMargin
}
