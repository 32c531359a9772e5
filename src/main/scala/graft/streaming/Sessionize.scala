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
    * timeout fired). */
  def updateUser(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start, s.lastSeen, s.nEvents, s.sumValue))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts.getTime - s.lastSeen.getTime <= gapMs =>
            cur = Some(s.copy(lastSeen = e.ts, nEvents = s.nEvents + 1,
              sumValue = s.sumValue + e.value))
          case Some(s) =>
            closed ::= Session(userId, s.start, s.lastSeen, s.nEvents,
              s.sumValue)
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // evict once the watermark passes the session gap
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
