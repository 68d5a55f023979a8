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

/** Native Count-Min Sketch aggregate (Cormode & Muthukrishnan 2005):
  * `depth` universal-hash rows × `width` counters in one flat
  * Array[Long] buffer — the streaming-frequency sketch whose estimate
  * `min_i cms[i][h_i(x)]` never undercounts and overcounts by at most
  * εN with high probability. The hash family is the same
  * `(h·a_i + b_i) mod prime mod width` stream as [[MinHashAgg]]
  * (coefficients from [[MinHashArray.coefficients]]), and the input is
  * expected PRE-REDUCED into [0, prime) — then every product stays
  * under 2^62, so the arithmetic is identical in any engine WITHOUT
  * relying on 64-bit wraparound, which is what makes the whole sketch
  * replayable in oracle SQL (the t20 gate inlines the coefficients and
  * rebuilds every cell with plain GROUP BYs).
  *
  * Scale shape: the buffer is depth×width longs per partition
  * regardless of input size, merge is elementwise add — a perfect
  * map-side combiner. A 100 TB token stream reduces to one
  * depth×width array at the driver; the exact groupBy it replaces
  * shuffles the full distinct-token set.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    seed: Long,
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val coefs: (Array[Long], Array[Long]) =
    MinHashArray.coefficients(depth, seed)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hp = v.asInstanceOf[Long]
      // enforce the pre-reduced contract: a raw 60-bit hash would
      // overflow hp*a and silently write row i's increment into row
      // i-1's counters — corrupting the sketch instead of failing fast
      require(hp >= 0 && hp < prime,
        s"count_min input must be pre-reduced into [0, $prime); got $hp")
      val (a, b) = coefs
      var i = 0
      while (i < depth) {
        val idx = (((hp * a(i) + b(i)) % prime) % width).toInt
        buf(i * width + idx) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) {
      b1(i) += b2(i)
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
  override def prettyName: String = "count_min_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** Column form: the flat depth×width CMS (ARRAY<BIGINT>, row-major)
    * of a group of hashes pre-reduced into [0, prime).
    */
  def count_min(hashCol: Column, depth: Int, width: Int, seed: Long,
                prime: Long): Column =
    GraftSqlBridge.column(
      CountMinAgg(GraftSqlBridge.expression(hashCol), depth, width, seed, prime)
        .toAggregateExpression())
}
