package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.streaming.{IncrementalProducer, StreamAggregator}

class StreamingSpec extends AnyFunSuite with SharedSpark {

  test("streamed exact agg equals batch agg (arrival-order independence)") {
    val streamed = StreamAggregator.streamAggQuery(spark, sf)
    val batch = StreamAggregator.dailyAggExact(Tables.events(spark, sf))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("incremental day-by-day replay == batch over union (SURVEY §5.4)") {
    val target = Files.createTempDirectory("graft-replay").toString
    // drop the first 3 days only, then stream what's there
    val days = IncrementalProducer.eventDays(spark, sf).take(3)
    days.foreach { d =>
      IncrementalProducer.dropDay(spark, sf, target, d,
        new java.sql.Timestamp(0L))
    }
    val streamed = StreamAggregator.runToMemoryTable(spark,
      StreamAggregator.dailyAggExact(
        StreamAggregator.replayStream(spark, s"$target/day=*",
          maxFilesPerTrigger = Some(1))),
      "replay_3days")
    val batch = StreamAggregator.dailyAggExact(
      Tables.events(spark, sf)
        .where(to_date(col("ts")).cast("string").isin(days: _*)))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("producer replay writes every source row exactly once") {
    val target = Files.createTempDirectory("graft-replay-full").toString
    val n = IncrementalProducer.replay(spark, sf, target)
    assert(n === Tables.events(spark, sf).count())
    val back = IncrementalProducer.readBack(spark, target)
    assert(back.count() === n)
    assert(back.columns.contains("processed_date"))
  }

  test("windowed agg with watermark emits event-time windows") {
    val events = StreamAggregator.eventsStream(spark, s"$sf/{events.parquet}")
    val windowed = StreamAggregator.windowedAggStream(events)
    val name = "windowed_test"
    val q = windowed.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-win").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
    // append mode emits only windows the watermark has passed; with a
    // single batch the watermark advances to max(ts) - 1h, so all but
    // the last hour's windows emit.
    assert(out.count() > 0, "no windows emitted")
    assert(out.columns.toSet ===
      Set("window_start", "window_end", "event_type", "n_events",
        "distinct_users", "max_value"))
    // every emitted window is exactly one hour
    val badLen = out.where(
      unix_timestamp(col("window_end")) - unix_timestamp(col("window_start"))
        =!= 3600).count()
    assert(badLen === 0)
  }
}
