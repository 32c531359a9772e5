package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream inner join with an event-time range condition — the
  * streaming surface the reference never needed but any production
  * event pipeline does ("what happened to this user in the week after
  * a high-value event?").
  *
  * Both sides carry watermarks and the join condition bounds event
  * time in BOTH directions (a.ts ∈ [f.ts, f.ts + window]), which is
  * exactly what lets Spark evict join state: flag-side rows age out
  * once the watermark passes flag_ts + window, event-side rows once
  * it passes their ts. Without the range bound the state grows
  * forever. Inner-join matches emit in the micro-batch they pair up —
  * no watermark withholding — so the streamed result over a replay
  * equals the batch join (StreamingSpec asserts set-equality).
  */
object StreamJoin {

  /** Follow-up events within `windowDays` after a high-value flag
    * event of the same user. `events` may be a streaming OR batch
    * DataFrame with (event_id, ts, user_id, value) — same plan both
    * ways, which is what the equivalence test exploits. */
  def flaggedFollowups(events: DataFrame, threshold: Double = 300.0,
      windowDays: Int = 7, watermark: String = "1 hour"): DataFrame = {
    val streaming = events.isStreaming
    def wm(df: DataFrame, c: String) =
      if (streaming) df.withWatermark(c, watermark) else df
    val flags = wm(events
      .where(col("value") >= threshold)
      .select(col("event_id").as("flag_id"), col("ts").as("flag_ts"),
        col("user_id").as("flag_user")), "flag_ts")
    val all = wm(events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type")), "ts")
    flags.join(all,
      col("flag_user") === col("user_id") &&
        col("ts") >= col("flag_ts") &&
        col("ts") <= col("flag_ts") + expr(s"INTERVAL $windowDays DAYS") &&
        col("event_id") =!= col("flag_id"))
      .select("flag_id", "event_id", "user_id", "event_type")
  }

  /** Batch oracle query (same operator over the batch table). */
  def flaggedFollowupsQuery(spark: SparkSession, dir: String): DataFrame =
    flaggedFollowups(graft.core.Tables.events(spark, dir))

  val flaggedFollowupsSql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |                  event_type, value FROM events)
      |SELECT f.event_id AS flag_id, a.event_id, a.user_id, a.event_type
      |FROM e f JOIN e a
      |  ON f.user_id = a.user_id
      | AND a.ts >= f.ts AND a.ts <= f.ts + INTERVAL 7 DAY
      | AND a.event_id != f.event_id
      |WHERE f.value >= 300.0""".stripMargin
}
