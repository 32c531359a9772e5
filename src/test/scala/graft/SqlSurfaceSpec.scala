package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The SQL entry point: Spark's own SQL engine must run the
  * ANSI-compatible subset of the registered oracle statements over the
  * registered temp views and reproduce the DataFrame-API results —
  * the reference's `spark.sql(...)` surface (S4) generalized to the
  * whole query set. DuckDB-dialect statements (string_split,
  * list_filter, epoch_ms, UNION ALL BY NAME, ::casts) are excluded. */
class SqlSurfaceSpec extends AnyFunSuite with SharedSpark {

  val ansiQueries = Seq(
    "q1_pricing_summary", "q_events_daily_agg", "q_topk_best_day",
    "q_sorted_agg", "q_distinct_types", "q_filter_isin",
    "q_filter_eq_project", "q_with_literal", "q_revenue_by_region",
    "q_revenue_by_priority", "q_argmax_per_customer",
    "q_semijoin_active_users", "q_order_ranks", "q_pricing_rollup",
    "q_set_ops")

  test("spark.sql runs the ANSI oracle statements to identical results") {
    Tables.registerAll(spark, sf)
    ansiQueries.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaApi = SparkEntry.queries(name)(spark, sf)
      val sqlCols = viaSql.columns.sorted.toSeq
      val apiCols = viaApi.columns.sorted.toSeq
      assert(sqlCols === apiCols, s"$name column mismatch")
      val a = viaSql.select(sqlCols.head, sqlCols.tail: _*)
      val b = viaApi.select(sqlCols.head, sqlCols.tail: _*)
      assert(a.exceptAll(b).count() === 0, s"$name: sql rows not in api")
      assert(b.exceptAll(a).count() === 0, s"$name: api rows not in sql")
    }
  }

  test("raw customerOrderArrays agrees with its hash-oracled CSV twin") {
    // The raw-array form stays out of the driver registry (pandas
    // cannot hash list cells), so its coverage lives here: rendering
    // the typed array must reproduce the oracled CSV query exactly.
    import org.apache.spark.sql.functions._
    val rendered = graft.engine.AnsiSurface.customerOrderArrays(spark, sf)
      .select(col("o_custkey"),
        array_join(transform(col("order_keys"), k => k.cast("string")), ",")
          .as("order_keys_csv"),
        col("n_orders"))
    val oracled = graft.engine.AnsiSurface.customerOrderArraysCsv(spark, sf)
    assert(rendered.exceptAll(oracled).count() === 0)
    assert(oracled.exceptAll(rendered).count() === 0)
  }

  test("string-derived oracle SQLs actually derived (no silent no-op)") {
    // Several oracle statements are composed from a base statement by
    // string surgery (.replace / CTE splice). String.replace with a
    // stale target is a silent no-op — round 12 shipped three oracles
    // that had quietly degenerated to their base when the components
    // SQL was refactored into a CTE (q_corpus_clean et al. regressed
    // to SELECT doc_id, component). Pin each derived statement to
    // (a) differ from its base and (b) contain the distinguishing
    // output marker its query's schema needs.
    import graft.ops.{Components, Pack, Mix, Dedup}
    val cases: Seq[(String, String, String, String)] = Seq(
      ("cleanCorpusSql", Components.cleanCorpusSql,
        Components.nearDupComponentsSql, "lang, source, n_chars"),
      ("dedupNearSurvivorsSql", Components.dedupNearSurvivorsSql,
        Components.nearDupComponentsSql, "n_members"),
      ("bestQualitySurvivorsSql", Components.bestQualitySurvivorsSql,
        Components.nearDupComponentsSql, "stopword_ratio"),
      ("lshDedupClustersPortableSql", Components.lshDedupClustersPortableSql,
        Dedup.minhashLshPairsPortableSql, "component"),
      ("packedPayloadsSql", Pack.packedPayloadsSql,
        Pack.packDocsSql, "payload"),
      ("shardManifestSql", Pack.shardManifestSql,
        Pack.packDocsSql, "shard_tokens"),
      ("crossSplitLeakageSql", Mix.crossSplitLeakageSql,
        Dedup.ngramJaccardPairsSql, "split_a"))
    cases.foreach { case (name, derived, base, marker) =>
      assert(derived != base, s"$name degenerated to its base SQL")
      assert(derived.contains(marker),
        s"$name lost its output marker '$marker'")
    }
  }
}
