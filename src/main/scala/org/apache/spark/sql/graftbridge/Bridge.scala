package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversion for custom Catalyst expressions.
  *
  * Spark 4 split `Column` from `Expression` (Connect-compatible column
  * nodes); the converters live in `ExpressionUtils`, which is
  * private[sql]. Hosting this one-file shim inside the
  * `org.apache.spark.sql` namespace is the established pattern public
  * Spark extension libraries use to reach such APIs (cf. the
  * DatasetFactory shims in open-source Spark extensions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * Dataset. Iterative algorithms (label propagation, Lloyd rounds)
    * checkpoint every iteration to cut lineage, but the superseded
    * iterations' blocks stay pinned until driver GC happens to drop
    * the Dataset AND the ContextCleaner gets around to them — at 10⁷
    * labels × 20 iterations that retention IS the memory ceiling.
    * The checkpoint RDD sits behind the Dataset's `LogicalRDD` plan
    * node (private[sql], hence this bridge); unpersisting it frees
    * the blocks immediately. Safe once a SUCCESSOR checkpoint is
    * materialized: localCheckpoint truncates lineage, so no later
    * frame reads the superseded blocks. No-op for plans that are not
    * a bare checkpoint.
    *
    * Spark logs one driver-side WARN per unpersisted checkpoint
    * ("cannot be recomputed after unpersisting") — expected and
    * correct here: the freed iteration is dead by construction, the
    * warning is Spark stating the contract the caller is relying
    * on. */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        ()
      case _ => ()
    }

  /** Drop the inherited `originStats` from a `localCheckpoint`ed
    * Dataset's `LogicalRDD`, reverting its size estimate to the
    * session default.
    *
    * Why: `localCheckpoint` truncates the LINEAGE but copies the
    * replaced plan's STATISTICS onto the checkpoint node. In an
    * iterative algorithm each round's plan multiplies its inputs'
    * sizeInBytes (join-size estimation), so the carried number
    * compounds EXPONENTIALLY across rounds -- by round ~7 of the CC
    * label loop the estimate is a hundred-megabit BigInteger and
    * Catalyst's stats visitor spends minutes doing bignum
    * multiplication (measured: round 6 = 9 s, round 7 = 196 s, pure
    * driver CPU in BigInteger.multiply). Resetting to the default
    * estimate keeps every round's planning O(1); the estimates were
    * astronomically wrong anyway, and join-strategy choice inside the
    * loop does not depend on them (both sides are checkpointed label
    * tables). */
  def withFreshStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val fresh = new org.apache.spark.sql.execution.LogicalRDD(
          l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
          l.isStreaming, l.stream)(df.queryExecution.sparkSession)
        org.apache.spark.sql.classic.Dataset.ofRows(
          df.queryExecution.sparkSession, fresh)
      case _ => df
    }
}
