package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature aggregate: one buffer of `numHashes` longs
  * updated in a tight primitive loop per input hash — replaces a
  * 64-column `min(pmod(h*a+b, p))` aggregation whose wide plan falls out
  * of whole-stage codegen (and pays quadratic planning). Produces
  * identical values: the same universal-hash family
  * `pmod(h * a_i + b_i, prime)` with coefficients drawn from
  * `scala.util.Random(seed)` in the same order.
  *
  * Buffer is O(numHashes) per group; merge is elementwise min — exactly
  * the combiner shape that scales map-side.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    seed: Long,
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val coefs: (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = (1 + r.nextInt(Int.MaxValue - 1)).toLong
      b(i) = r.nextInt(Int.MaxValue).toLong
      i += 1
    }
    (a, b)
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val (a, b) = coefs
      var i = 0
      while (i < numHashes) {
        val x = h * a(i) + b(i) // wraps like Spark long arithmetic
        val m = x % prime
        val pm = if (m < 0) m + prime else m
        if (pm < buf(i)) buf(i) = pm
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column form: minhash signature (ARRAY<BIGINT> of length numHashes)
    * of a group of pre-hashed shingles.
    */
  def minhash(hashCol: Column, numHashes: Int, seed: Long, prime: Long): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(hashCol), numHashes, seed, prime)
        .toAggregateExpression())
}
