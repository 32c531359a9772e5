package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Sketch mode: a Catalyst optimizer rule that rewrites exact
  * `COUNT(DISTINCT x)` into `approx_count_distinct(x)` (HLL++) when
  * `spark.graft.sketchMode=true`.
  *
  * Why as a RULE rather than editing queries: at 100 TB an exact
  * multi-distinct aggregate plans an Expand that multiplies scan rows
  * by the number of distinct aggregates and keeps per-group hash sets
  * in memory; the sketch form is one pass with fixed-size state
  * (measured 3× on the profiler, SCALE.md). A session-wide flag lets
  * the SAME query text run oracle-exact in CI and sketched in
  * production — no operator rewrites, no second code path.
  *
  * Two injection points, same rule object:
  *  - production: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (SparkSessionExtensions, applied at session build);
  *  - runtime: `spark.experimental.extraOptimizations` (the form the
  *    tests use, since a shared test session already exists).
  *
  * Only single-argument COUNT(DISTINCT) rewrites; multi-arg distincts
  * and every other aggregate pass through untouched. The rewrite keeps
  * the FILTER clause and produces the same LongType.
  */
case class SketchModeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf.getOption("spark.graft.sketchMode")
      .exists(_.equalsIgnoreCase("true"))
    if (!enabled) plan
    else plan.transformAllExpressions {
      case AggregateExpression(Count(Seq(child)), _, true, filter, id) =>
        AggregateExpression(
          HyperLogLogPlusPlus(child), Complete, isDistinct = false,
          filter, id)
    }
  }
}

/** `spark.sql.extensions` entry point: sketch-mode rule + the graft SQL
  * functions registered session-wide (vs the runtime
  * `VectorFunctions.register`, which is temp-function-per-session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(SketchModeRule)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(exprs(0), exprs(1))))
  }
}
