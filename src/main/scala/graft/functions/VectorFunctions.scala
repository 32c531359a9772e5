package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns.
  *
  * Why custom (SURVEY §7 step 7: "an `Expression` for cosine
  * similarity"): the built-in composition
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically identical
  * but runs interpreted (higher-order functions have no codegen) and
  * allocates an intermediate array per row — at billions of candidate
  * pairs that's the hot loop of every similarity operator. This
  * expression generates a primitive `double[]` loop inside whole-stage
  * codegen: no allocation, no virtual calls, auto-vectorizable.
  *
  * Null/length semantics: null if either side is null; mismatched
  * lengths dot the common prefix (callers validate dims upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $xs[$i] * $ys[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native Catalyst expression for PQ asymmetric-distance scoring:
  * `adc_score(codes, lut) = Σⱼ lut[j][codes[j]]` over a per-row
  * `array<int>` code vector and a (broadcast-joined) per-query
  * `array<array<double>>` lookup table.
  *
  * Why custom: the equivalent built-in composition
  * `aggregate(zip_with(codes, lut, (c, l) -> element_at(l, c + 1)),
  * 0d, _+_)` is the HOT LOOP of the PQ/IVF-PQ probe — it runs once
  * per (query, candidate) — and higher-order functions run
  * interpreted, allocate a zipped intermediate array per row, and
  * bounds-check through `element_at`'s 1-based indirection. This
  * generates a primitive loop of m indexed loads inside whole-stage
  * codegen, the PQ analogue of [[DotProduct]].
  *
  * Null/length semantics: null if either side is null; scoring runs
  * over the common prefix (callers guarantee m codes and m LUT rows,
  * and `pqEncode` guarantees codes ∈ [0, ksub) — the per-subspace LUT
  * width). */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adc_score needs (array<int>, array<array<double>>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var j = 0
    while (j < n) {
      acc += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  $acc += $b.getArray($j).getDouble($a.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Column-level vector math used by similarity / dedup operators. */
object VectorFunctions {

  /** Cast array<float> (the on-disk embedding type) to array<double> so
    * all vector math is double — deterministic and oracle-comparable. */
  def toDoubleVec(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Codegen'd dense dot product (see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd PQ asymmetric-distance score (see [[AdcScore]]). */
  def adcScore(codes: Column, lut: Column): Column =
    Bridge.column(AdcScore(Bridge.expression(codes), Bridge.expression(lut)))

  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  /** Unit-normalize once upstream so cosine degenerates to [[dot]] —
    * halves the flops of every downstream pairwise comparison. */
  def normalize(c: Column): Column = {
    val n = l2Norm(c)
    when(n === 0.0, c).otherwise(transform(c, x => x / n))
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Register dot_product for SQL use:
    * SELECT dot_product(a.embedding, b.embedding) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}
