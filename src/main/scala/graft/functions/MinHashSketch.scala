package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single native aggregate — the
  * sketch-shaped `TypedImperativeAggregate` SURVEY §4/§7 anticipates
  * ("a TypedImperativeAggregate if we want a sketch under memory
  * bound", the same extension class Spark's own HyperLogLogPlusPlus
  * uses).
  *
  * `minhash_sketch(shingle)` grouped by document yields the same
  * `array<bigint>` signature as 64 separate `min(xxhash64(seed,
  * shingle))` aggregate columns (bit-identical — it reuses
  * [[XxHash64Function]] with the same seed chaining), but with one
  * fixed-size buffer per group instead of 64 independent aggregate
  * slots: one pass, one buffer allocation, straight-line update loop.
  *
  * Scale behavior matches any algebraic aggregate: updates fold
  * map-side, partial buffers (numHashes longs) merge elementwise-min
  * on the reduce side, so the shuffle carries #docs × 512 bytes
  * regardless of shingle count.
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  /** Same value xxhash64(lit(seed), shingle) computes: Spark chains
    * multi-argument xxhash64 as hash(arg_i, seed = previous), starting
    * from 42L — so per-seed component = XXH64(shingleBytes,
    * XXH64(seedLong, 42L)). */
  private def hashWithSeed(seed: Int, s: UTF8String): Long = {
    // lit(seed) is an IntegerType literal — must chain via the int
    // hash path, not the long one, to match xxhash64(lit(seed), col)
    val chained = XxHash64Function.hash(seed, IntegerType, 42L)
    XxHash64Function.hash(s, StringType, chained)
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = hashWithSeed(i, s)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sketch"
}

object MinHashSketch {
  /** Column form: `minhash_sketch(shingleCol)` aggregate. */
  def minhash_sketch(c: Column, numHashes: Int = 64): Column =
    Bridge.column(
      MinHashSketchAgg(Bridge.expression(c), numHashes)
        .toAggregateExpression())

  /** Register for SQL: SELECT minhash_sketch(shingle) ... GROUP BY doc. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sketch",
      exprs => MinHashSketchAgg(exprs.head).toAggregateExpression(),
      "scala_udf")
}
