package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark 4) — the pre-aggregation pattern that serves distinct
  * counts at 100 TB without rescanning raw data: fine-grained sketches
  * are computed ONCE at ingest grain and persisted; any coarser
  * rollup (weekly, monthly, all-time, cross-segment) is a UNION of
  * sketch buffers — bytes-sized state, no shuffle of raw ids, and no
  * second pass over the events table. `approx_count_distinct` cannot
  * do this: its HLL++ buffer is consumed inside one aggregate and
  * cannot be stored or merged across queries.
  *
  * Accuracy: lgConfigK=12 ⇒ ~1.6% relative standard error; the
  * rollup-vs-exact band is asserted in OpsSpec.
  */
object Sketches {

  /** Per-(event_type, day) HLL sketch of distinct users — the ingest
    * grain a pipeline would persist alongside its daily partitions. */
  def dailyUserSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Monthly distinct users per event type — computed purely by
    * merging the daily sketches, never touching raw events. */
  def monthlyDistinctFromDaily(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"),
        date_trunc("month", col("day")).cast("date").as("month"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("user_sketch")))
          .as("distinct_users_est"),
        sum(col("n_events")).as("n_events"))

  /** Registered query: monthly estimates via sketch merge (rows-only —
    * estimates can't hash-match an exact oracle; the band test is in
    * OpsSpec). */
  def monthlyUserEstimates(spark: SparkSession, dir: String): DataFrame =
    monthlyDistinctFromDaily(dailyUserSketches(spark, dir))

  /** The quantile analog (DataSketches KLL): per-day value sketches,
    * merged to monthly percentiles without rescanning — what
    * `approx_percentile` cannot do across queries. KLL rank error at
    * the default k is ~1.3%; band vs exact asserted in OpsSpec. */
  def dailyValueSketches(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("kll_sketch_agg_double(value)").as("value_sketch"),
        count(lit(1)).as("n_events"))

  def monthlyQuantilesFromDaily(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_type"),
        date_trunc("month", col("day")).cast("date").as("month"))
      .agg(expr(
        "kll_sketch_get_quantile_double(" +
          "kll_merge_agg_double(value_sketch), array(0.5D, 0.99D))")
        .as("q"))
      .select(col("event_type"), col("month"),
        col("q").getItem(0).as("q50_est"),
        col("q").getItem(1).as("q99_est"))

  def monthlyValueQuantiles(spark: SparkSession, dir: String): DataFrame =
    monthlyQuantilesFromDaily(dailyValueSketches(spark, dir))
}
