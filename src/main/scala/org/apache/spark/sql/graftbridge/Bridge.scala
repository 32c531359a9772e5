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
}
