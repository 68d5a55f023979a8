package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd PQ subspace kernels over an ARRAY<FLOAT> column —
  * the per-row hot loop of PQ encode (16 L2 evaluations per corpus
  * row: 4 subspaces × 4 centroids) and of the ADC lookup-table build.
  *
  * Replaces the `aggregate(zip_with(slice(...)))` higher-order forms,
  * which evaluate INTERPRETED per row (a lambda invocation and a
  * sliced temp array per call). A fully UNROLLED element_at/arithmetic
  * tree was measured first and regressed 3–4× instead: 4 subspaces ×
  * 4 centroids × 16 dims of Add/Multiply/Cast nodes per projection
  * blows the generated method past the JIT-friendly size and the
  * whole stage falls back to interpreted evaluation of a 2 000-node
  * tree. A single Expression with a `doGenCode` loop is the shape the
  * build guidance prefers (see [[CosineSimilarity]]): one compact
  * compiled loop per kernel, constants shipped once per task via
  * `addReferenceObj`, plan tree a single node.
  *
  * Semantics replicate the HOF forms bit-for-bit: the accumulator
  * starts at 0.0 and folds LEFT-TO-RIGHT; each term reads
  * CAST(arr[offset+i] AS DOUBLE) against the float-rounded centroid
  * component (the HOF compared against an `array<float>` literal cast
  * back to double — `cent(i).toFloat.toDouble` here); a missing or
  * null-holding window (`zip_with`'s null padding on a short array, a
  * null element) yields NULL exactly as the aggregated HOF did.
  */
abstract class PqSubKernel extends UnaryExpression {
  def offset: Int
  def centroid: Array[Double]

  /** Float-rounded centroid, as the double each term multiplies —
    * exactly the HOF's array<float>-literal-cast-to-double protocol.
    */
  protected lazy val centF: Array[Double] =
    centroid.map(v => v.toFloat.toDouble)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT>, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** One accumulation step: given the element and constant, the term
    * added to the accumulator. */
  protected def term(x: Double, c: Double): Double
  protected def termCode(x: String, c: String): String

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = centF.length
    // zip_with on a short array pads with nulls and the HOF sum goes
    // null; a null element nulls the sum the same way
    if (a.numElements() < offset + n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(offset + i)) return null
      acc += term(a.getFloat(offset + i).toDouble, centF(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cent = ctx.addReferenceObj("cent", centF, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |if ($a.numElements() < ${offset + centF.length}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < ${centF.length}; $i++) {
         |    if ($a.isNullAt($offset + $i)) { ${ev.isNull} = true; break; }
         |    double $x = (double) $a.getFloat($offset + $i);
         |    $acc += ${termCode(x, s"$cent[$i]")};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Σ_i (arr[offset+i] − cent_i)² — the Lloyd/encode assignment
  * distance. */
case class PqSubL2(child: Expression, offset: Int,
                   centroid: Array[Double]) extends PqSubKernel {
  override def prettyName: String = "pq_sub_l2"
  override protected def term(x: Double, c: Double): Double = {
    val d = x - c; d * d
  }
  override protected def termCode(x: String, c: String): String =
    s"($x - $c) * ($x - $c)"
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Σ_i arr[offset+i] · cent_i — the ADC lookup-table inner product. */
case class PqSubDot(child: Expression, offset: Int,
                    centroid: Array[Double]) extends PqSubKernel {
  override def prettyName: String = "pq_sub_dot"
  override protected def term(x: Double, c: Double): Double = x * c
  override protected def termCode(x: String, c: String): String =
    s"$x * $c"
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PqKernels {
  def pq_sub_l2(a: Column, offset: Int, cent: Array[Double]): Column =
    GraftSqlBridge.column(PqSubL2(GraftSqlBridge.expression(a), offset, cent))
  def pq_sub_dot(a: Column, offset: Int, cent: Array[Double]): Column =
    GraftSqlBridge.column(PqSubDot(GraftSqlBridge.expression(a), offset, cent))
}
