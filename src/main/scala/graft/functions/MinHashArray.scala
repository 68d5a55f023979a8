package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-ROW MinHash signature over an ARRAY<BIGINT> of shingle hashes —
  * the zero-shuffle complement of [[MinHashAgg]]: a document's signature
  * depends only on its own shingle set, so when shingles are carried as
  * an array column the whole signature computes inside a projection
  * (scan → project, embarrassingly parallel at any scale) instead of an
  * explode + groupBy shuffle over every (doc, shingle) row.
  *
  * Same universal-hash family as [[MinHashAgg]] — `pmod(h*a_i+b_i, prime)`
  * with coefficients drawn from `scala.util.Random(seed)` in the same
  * order — so both forms produce identical signatures for identical
  * input hash sets.
  */
case class MinHashArray(child: Expression, numHashes: Int, seed: Long,
                        prime: Long)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_array expects ARRAY<BIGINT>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_array"

  // identical coefficient stream to MinHashAgg (same seed ⇒ same family)
  @transient private lazy val coefs: (Array[Long], Array[Long]) =
    MinHashArray.coefficients(numHashes, seed)

  private def compute(hashes: ArrayData): GenericArrayData = {
    val (a, b) = coefs
    val buf = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      // null slots are skipped (a null shingle hash is "absent", and the
      // codegen path below must agree — reading a null slot's storage
      // would fold an undefined 0 into the signature)
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var i = 0
        while (i < numHashes) {
          val x = h * a(i) + b(i) // wraps like Spark long arithmetic
          val m = x % prime
          val pm = if (m < 0) m + prime else m
          if (pm < buf(i)) buf(i) = pm
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(buf)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefs._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefs._2, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      s"""
         |int $n = $in.numElements();
         |long[] $buf = new long[$numHashes];
         |java.util.Arrays.fill($buf, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($in.isNullAt($j)) continue; // skip null slots, like compute()
         |  long $h = $in.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $x = $h * $aRef[$i] + $bRef[$i];
         |    long $m = $x % ${prime}L;
         |    if ($m < 0) $m += ${prime}L;
         |    if ($m < $buf[$i]) $buf[$i] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buf);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashArray =
    copy(child = newChild)
}

object MinHashArray {
  /** The universal-hash coefficient stream — shared by the expression
    * and by oracle-SQL generation (d09 inlines these constants into
    * DuckDB text so the LSH banding itself is cross-engine-checkable).
    */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
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

  /** Column form: per-row minhash signature (ARRAY<BIGINT> of length
    * numHashes) of an ARRAY<BIGINT> of pre-hashed shingles.
    */
  def minhash_array(hashes: Column, numHashes: Int, seed: Long,
                    prime: Long): Column =
    GraftSqlBridge.column(MinHashArray(
      GraftSqlBridge.expression(hashes), numHashes, seed, prime))
}
