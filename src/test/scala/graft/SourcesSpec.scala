package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Schemas, Tables}
import graft.plans.AsOfJoin
import graft.sources.Formats

class SourcesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("CSV and JSONL round-trip the customer table losslessly") {
    val base = Files.createTempDirectory("graft-fmt").toString
    val src = Tables.customer(spark, sf)
    Formats.writeCsv(src, s"$base/csv")
    val csvBack = Formats.readCsv(spark, Schemas.customer, s"$base/csv")
    assert(csvBack.exceptAll(src).count() === 0)
    assert(src.exceptAll(csvBack).count() === 0)

    Formats.writeJsonl(src, s"$base/jsonl")
    val jsonBack = Formats.readJsonl(spark, Schemas.customer, s"$base/jsonl")
    assert(jsonBack.exceptAll(src).count() === 0)

    Formats.writeParquet(src, s"$base/parquet")
    val pqBack = Formats.readParquet(spark, Schemas.customer, s"$base/parquet")
    assert(pqBack.exceptAll(src).count() === 0)
  }

  test("as-of join picks the nearest predecessor, nulls before any") {
    val events = Seq(
      (1L, 100L, Timestamp.valueOf("2024-01-01 00:00:05"), "view"),
      (2L, 100L, Timestamp.valueOf("2024-01-01 00:00:15"), "view"),
      (3L, 100L, Timestamp.valueOf("2024-01-01 00:00:10"), "tie"),
      (4L, 200L, Timestamp.valueOf("2024-01-01 00:00:01"), "early"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val orders = Seq(
      (100L, Timestamp.valueOf("2024-01-01 00:00:04"), 11L, 10.0),
      (100L, Timestamp.valueOf("2024-01-01 00:00:10"), 12L, 20.0),
      (100L, Timestamp.valueOf("2024-01-01 00:00:10"), 13L, 30.0),
      (200L, Timestamp.valueOf("2024-01-02 00:00:00"), 14L, 40.0))
      .toDF("user_id", "o_orderdate", "o_orderkey", "o_totalprice")
    val got = AsOfJoin.asOf(events, orders,
      "user_id", "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(1L) === 11L)   // only order 11 precedes t=5
    assert(got(2L) === 13L)   // latest ≤ 15 is t=10; tie → max orderkey
    assert(got(3L) === 13L)   // equal instant included (≤), tie → 13
    assert(got(4L) === -1L)   // user 200 has no prior order → null
  }

  test("as-of join shuffles once on the key (no join explosion)") {
    val plan = AsOfJoin.eventsWithLatestOrder(spark, sf)
      .queryExecution.executedPlan.toString
    // composed as union + window: exactly one hash exchange on the key,
    // no BroadcastNestedLoopJoin / cartesian anywhere
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
