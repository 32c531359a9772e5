package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Pipeline observability: statistical monitors over the ingest
  * stream itself — the queries an operator of a 100 TB/day pipeline
  * alerts on, distinct from the curation queries that transform the
  * data. Reference behavior covered: none (extension; the reference's
  * monitoring is display-only `show()` calls — SURVEY §2 K3).
  *
  * Determinism discipline: every statistic is derived from INTEGER
  * day-grain sums (counts, sum, sum-of-squares) carried as BIGINT;
  * the float step (mean/variance/z) is a FIXED expression shape —
  * `CAST(sum AS DOUBLE)/n`, `CAST(sumsq AS DOUBLE)/n - mean*mean` —
  * evaluated identically by Spark and DuckDB (IEEE 754 doubles,
  * correctly-rounded / and sqrt), so the z-scores hash-match the
  * oracle exactly. Built-in `stddev` is deliberately avoided: engines
  * disagree on the algorithm (Welford vs naive) in the last ulp.
  */
object Monitor {

  /** Daily ingest-volume anomaly screen, per event type: each day's
    * event count z-scored against its trailing 7-day window (rows
    * between 7 preceding and 1 preceding — the current day never
    * contaminates its own baseline). Days with fewer than 3 trailing
    * days, or a zero-variance baseline, emit a null z (insufficient
    * signal ≠ anomaly).
    *
    * Scale shape: one events scan collapsed map-side to the
    * (event_type, day) grain — the shuffle carries ≤ |types|·|days|
    * rows, constant in event volume; the window runs per event type
    * over the DENSE-ish day axis (calendar-bounded, like the
    * interval-stabbing sweep), so the single-partition hazard of a
    * global window never appears and the whole query past the scan
    * is calendar-sized at any data scale. */
  def volumeAnomaly(spark: SparkSession, dir: String,
      zThreshold: Double = 3.0): DataFrame =
    volumeAnomalyFor(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")), zThreshold)

  /** [[volumeAnomaly]] over any (event_type, day, n) day-grain frame —
    * the form the streaming monitor derives its screen from (the
    * day-grain table is additive, so a stream maintains it
    * incrementally and re-derives the calendar-sized screen per
    * batch). */
  def volumeAnomalyFor(daily: DataFrame,
      zThreshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val stats = daily.select(col("event_type"), col("day"), col("n"),
      count(col("n")).over(w).as("t_days"),
      sum(col("n")).over(w).as("t_sum"),
      sum(col("n") * col("n")).over(w).as("t_sumsq"))
    val mean = col("t_sum").cast("double") / col("t_days")
    val variance = col("t_sumsq").cast("double") / col("t_days") -
      mean * mean
    val z = when(col("t_days") >= 3 && variance > 0,
      (col("n").cast("double") - mean) / sqrt(variance))
    stats.select(col("event_type"), col("day"), col("n"),
        col("t_days"), col("t_sum"),
        z.as("z"),
        when(z.isNotNull && abs(z) > zThreshold, lit(1L))
          .otherwise(lit(0L)).as("is_anomaly"))
  }

  val volumeAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, day, n,
      |         CAST(COUNT(n) OVER w AS BIGINT) AS t_days,
      |         CAST(SUM(n) OVER w AS BIGINT) AS t_sum,
      |         CAST(SUM(n * n) OVER w AS BIGINT) AS t_sumsq
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT *,
      |         CASE WHEN t_days >= 3
      |                   AND CAST(t_sumsq AS DOUBLE) / t_days -
      |                       (CAST(t_sum AS DOUBLE) / t_days) *
      |                       (CAST(t_sum AS DOUBLE) / t_days) > 0
      |              THEN (CAST(n AS DOUBLE) -
      |                    CAST(t_sum AS DOUBLE) / t_days) /
      |                   sqrt(CAST(t_sumsq AS DOUBLE) / t_days -
      |                        (CAST(t_sum AS DOUBLE) / t_days) *
      |                        (CAST(t_sum AS DOUBLE) / t_days))
      |              ELSE NULL END AS z
      |  FROM st)
      |SELECT event_type, day, n, t_days, t_sum, z,
      |       CASE WHEN z IS NOT NULL AND abs(z) > 3.0
      |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
      |         AS is_anomaly
      |FROM z""".stripMargin
}
