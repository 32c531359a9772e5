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

  // loud, not silently corrupt: an out-of-range code against an
  // UnsafeArrayData LUT row reads adjacent memory — garbage scores
  // with no exception (codes and LUT built from different codebooks).
  // The bounds branch sits per (code, row) next to the array read;
  // the LshSignature fail-loud discipline.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var j = 0
    while (j < n) {
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements())
        AdcScore.rangeErrorJava(c, j, row.numElements())
      acc += row.getDouble(c)
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
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $row =
         |    $b.getArray($j);
         |  int $c = $a.getInt($j);
         |  if ($c < 0 || $c >= $row.numElements()) {
         |    graft.functions.AdcScore.rangeErrorJava($c, $j,
         |      $row.numElements());
         |  }
         |  $acc += $row.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object AdcScore {
  /** Static forwarder target for the generated code's bounds branch
    * (generated Java cannot call a Scala object method directly). */
  def rangeErrorJava(c: Int, j: Int, w: Int): Unit =
    throw new IllegalArgumentException(
      s"adc_score: code $c out of range for LUT row $j of width $w — " +
        "codes and LUT come from different codebooks")
}

object BestCell {
  /** Static forwarder target for the generated code's no-best branch. */
  def noBestError(): Unit =
    throw new IllegalArgumentException(
      "best_cell: no centroid compared above -Infinity — the vector " +
        "contains NaN (or every dot product is -Infinity); refusing " +
        "to emit the invalid sentinel cell id -1")
}

/** Native Catalyst expression for exact nearest-centroid assignment:
  * `best_cell(vec, cells)` scans an `array<struct<cid:int,
  * cvec:array<double>>>` (the whole centroid table, riding in as one
  * broadcast row) and returns `struct<cid:int, sim:double>` for the
  * argmax dot product — ties to the LOWEST cid, exactly the
  * `max_by(cid, struct(sim, -cid))` contract of the join-based
  * assigner.
  *
  * Why custom: nprobe=1 assignment is a pure per-row reduction, but
  * the composable form (crossJoin + transform-lambda dots + explode +
  * groupBy-argmax) pays interpreted higher-order functions PLUS an
  * n·k-row exchange just to keep each row's maximum — measured 290 s
  * for 1M vectors × 1k cells where this expression's single codegen
  * pass needs no shuffle at all. The k·dim inner loop is primitive,
  * allocation-free, and auto-vectorizable, and order-independence of
  * max with the cid tie-break makes the result independent of
  * `collect_list`'s arrival order. Empty/null inputs yield null (the
  * join form yields no row; callers guarantee k ≥ 1). */
case class BestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  // genuinely nullable regardless of child nullability: an EMPTY
  // centroid array yields null (both eval paths). Inheriting
  // `left.nullable || right.nullable` would, for non-nullable inputs,
  // make codegen emit the literal `false` for ev.isNull — the empty-
  // cells branch's `false = true;` assignment then fails Janino
  // compilation and silently drops the whole stage to interpreted
  // eval, which would return null from a "non-nullable" expression.
  override def nullable: Boolean = true

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("sim", DoubleType,
        nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(org.apache.spark.sql.types.StructType(fs), _))
          if fs.length == 2 &&
            fs(0).dataType == org.apache.spark.sql.types.IntegerType &&
            (fs(1).dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"best_cell needs (array<double>, array<struct<int,array<double>>>), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val cells = b.asInstanceOf[ArrayData]
    if (cells.numElements() == 0) return null
    var best = -1
    var bestSim = Double.NegativeInfinity
    var j = 0
    while (j < cells.numElements()) {
      val cell = cells.getStruct(j, 2)
      val cid = cell.getInt(0)
      val cv = cell.getArray(1)
      val n = math.min(xs.length, cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += xs(i) * cv.getDouble(i); i += 1 }
      if (acc > bestSim || (acc == bestSim && cid < best)) {
        bestSim = acc; best = cid
      }
      j += 1
    }
    // loud, not a sentinel: a NaN anywhere in the vector makes every
    // comparison false, so `best` would stay -1 and the invalid cell
    // id silently mis-cells (or drops) the row in downstream joins
    if (best == -1) BestCell.noBestError()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestSim))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cell = ctx.freshName("cell")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($b.numElements() == 0) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  double[] $xs = $a.toDoubleArray();
         |  int $best = -1;
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $b.numElements(); $j++) {
         |    org.apache.spark.sql.catalyst.InternalRow $cell =
         |      $b.getStruct($j, 2);
         |    int $cid = $cell.getInt(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      $cell.getArray(1);
         |    int $n = java.lang.Math.min($xs.length, $cv.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $xs[$i] * $cv.getDouble($i);
         |    }
         |    if ($acc > $bestSim || ($acc == $bestSim && $cid < $best)) {
         |      $bestSim = $acc; $best = $cid;
         |    }
         |  }
         |  if ($best == -1) graft.functions.BestCell.noBestError();
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $best, $bestSim });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Native Catalyst expression for unit-normalizing an `array<double>`
  * column in ONE pass: accumulate Σx², divide each element by the
  * root. Zero-norm vectors pass through unchanged (the documented
  * `normalize` contract).
  *
  * Why custom: the column-function form
  * `when(l2Norm(c) === 0, c).otherwise(transform(c, x => x / l2Norm(c)))`
  * captures the norm EXPRESSION inside the `transform` lambda, and
  * higher-order functions run interpreted with no common-subexpression
  * elimination — the full Σx² loop re-evaluates once PER ELEMENT
  * (dim² multiplies per row; measured 152.7 s just to normalize 1M
  * 64-dim vectors, dominating the semantic-dedup screen). This is the
  * [[DotProduct]] discipline applied to the normalize that feeds
  * every similarity operator's first projection.
  *
  * Bit-compatibility: same accumulation order, same sqrt, same
  * per-element divide as the old form — identical doubles out, so
  * every hash-oracled downstream result is unchanged. */
case class NormalizeVec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = child.dataType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_vec needs array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[ArrayData]
    val xs = in.toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < xs.length) { acc += xs(i) * xs(i); i += 1 }
    val nrm = math.sqrt(acc)
    if (nrm == 0.0) in
    else {
      val out = new Array[Double](xs.length)
      var j = 0
      while (j < xs.length) { out(j) = xs(j) / nrm; j += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) { $acc += $xs[$i] * $xs[$i]; }
         |double $nrm = java.lang.Math.sqrt($acc);
         |if ($nrm == 0.0) {
         |  ${ev.value} = $a;
         |} else {
         |  double[] $out = new double[$xs.length];
         |  for (int $j = 0; $j < $xs.length; $j++) { $out[$j] = $xs[$j] / $nrm; }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(newChild)
}

/** Native Catalyst expression for the full sign-LSH signature of a
  * vector: `lsh_signature(vec, planes)` over an `array<double>` and a
  * flattened `array<array<double>>` of numTables·bitsPerTable
  * hyperplanes (table-major) returns the `array<int>` of per-table
  * bucket ids — bucket_t = Σ_b (vec·plane[t·bits+b] ≥ 0) << b.
  *
  * Why custom: the column composition materializes numTables ×
  * bitsPerTable separate `dot(vec, literal-array)` expressions — at
  * the auto-tuned 16 tables × 10+ bits that is thousands of literal
  * expression nodes per projection, past whole-stage codegen's method
  * budget, so the signature pass of [[graft.ops.Similarity
  * .lshNearDupPairs]] dropped to interpreted evaluation (measured
  * ~1 ms/row at the ×10 decade bench — 21 s of the 21 s pass). One
  * expression with the planes as a SINGLE literal runs the whole
  * signature as a primitive nested loop inside codegen — the
  * [[BestCell]] discipline applied to LSH.
  *
  * Bit-compatibility: each plane dot accumulates in ascending index
  * order over the common prefix and compares `>= 0.0` — exactly the
  * old per-plane [[DotProduct]] composition, so bucket ids (hence
  * candidate sets, hence results) are identical. */
case class LshSignature(left: Expression, right: Expression,
    bitsPerTable: Int) extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if bitsPerTable > 0 && bitsPerTable < 31 => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_signature needs (array<double>, array<array<double>>) and " +
        s"0 < bitsPerTable < 31, got ${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}, bits=$bitsPerTable")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ps = b.asInstanceOf[ArrayData]
    // a non-dividing plane count would silently TRUNCATE (fewer
    // tables than the caller wired), and checkInputDataTypes cannot
    // see array lengths — fail loud instead; one modulo per row is
    // noise next to the dot loops
    if (ps.numElements() % bitsPerTable != 0)
      throw new IllegalArgumentException(
        s"lsh_signature: ${ps.numElements()} planes is not a multiple " +
          s"of bitsPerTable=$bitsPerTable")
    val numTables = ps.numElements() / bitsPerTable
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var bIdx = 0
      while (bIdx < bitsPerTable) {
        val plane = ps.getArray(t * bitsPerTable + bIdx)
        val n = math.min(xs.length, plane.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) { acc += xs(i) * plane.getDouble(i); i += 1 }
        if (acc >= 0.0) bucket |= 1 << bIdx
        bIdx += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val numTables = ctx.freshName("numTables")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val bIdx = ctx.freshName("bIdx")
      val bucket = ctx.freshName("bucket")
      val plane = ctx.freshName("plane")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |if ($b.numElements() % $bitsPerTable != 0) {
         |  throw new IllegalArgumentException(
         |    "lsh_signature: " + $b.numElements() + " planes is not a " +
         |    "multiple of bitsPerTable=" + $bitsPerTable);
         |}
         |int $numTables = $b.numElements() / $bitsPerTable;
         |int[] $out = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $bucket = 0;
         |  for (int $bIdx = 0; $bIdx < $bitsPerTable; $bIdx++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $plane =
         |      $b.getArray($t * $bitsPerTable + $bIdx);
         |    int $n = java.lang.Math.min($xs.length, $plane.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $xs[$i] * $plane.getDouble($i);
         |    }
         |    if ($acc >= 0.0) { $bucket |= 1 << $bIdx; }
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(newLeft, newRight, bitsPerTable)
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

  /** Codegen'd exact argmax-dot centroid assignment (see [[BestCell]]):
    * `best_cell(vec, cells)` → struct<cid, sim>. */
  def bestCell(vec: Column, cells: Column): Column =
    Bridge.column(BestCell(Bridge.expression(vec), Bridge.expression(cells)))

  /** Codegen'd full sign-LSH signature (see [[LshSignature]]):
    * `lshSignature(vec, planes, bits)` → array<int> per-table buckets. */
  def lshSignature(vec: Column, planes: Column, bitsPerTable: Int): Column =
    Bridge.column(LshSignature(Bridge.expression(vec),
      Bridge.expression(planes), bitsPerTable))

  def l2Norm(c: Column): Column = sqrt(dot(c, c))

  /** Unit-normalize once upstream so cosine degenerates to [[dot]] —
    * halves the flops of every downstream pairwise comparison.
    * Codegen'd single pass (see [[NormalizeVec]]: the old
    * transform-lambda form re-evaluated the norm per element). */
  def normalize(c: Column): Column =
    Bridge.column(NormalizeVec(Bridge.expression(c)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Register dot_product for SQL use:
    * SELECT dot_product(a.embedding, b.embedding) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
}
