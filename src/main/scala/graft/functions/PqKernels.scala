package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** Element-wise float residual of two ARRAY<FLOAT> columns —
  * `zip_with(a, b, (x, y) => (x.double − y.double).float)` as one
  * compiled loop (the IVF-PQ residual q − c / v − c, evaluated once
  * per corpus row at encode time). Semantics replicate zip_with
  * bit-for-bit: the result has max(|a|, |b|) elements, a position
  * missing from either side (short array) or holding a null yields a
  * NULL element; a null array yields NULL (BinaryExpression's
  * null-safe contract, same as zip_with's null-input propagation).
  */
case class ArrFloatSub(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "arr_float_sub"
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
            s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.max(a.numElements(), b.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < a.numElements() && i < b.numElements() &&
          !a.isNullAt(i) && !b.isNullAt(i))
        out(i) = (a.getFloat(i).toDouble - b.getFloat(i).toDouble).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val vals = ctx.freshName("vals")
      s"""
         |int $n = Math.max($a.numElements(), $b.numElements());
         |Object[] $vals = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i < $a.numElements() && $i < $b.numElements() &&
         |      !$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $vals[$i] = Float.valueOf((float)
         |      ((double) $a.getFloat($i) - (double) $b.getFloat($i)));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Full-length double dot product of two ARRAY<FLOAT> columns —
  * `aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, +)`
  * as one compiled loop (the IVF-PQ probe's q·c correction term; with
  * a ≡ b it is the aggregate(transform(...)) squared norm — identical
  * term order and accumulation). Bit-identical semantics: left fold
  * from 0.0; mismatched lengths (zip_with's null padding) or a null
  * element yield NULL.
  */
case class ArrFloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "arr_float_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
            s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace reconstruction norm ‖c + r̂‖² with a DYNAMIC codebook
  * row — the IVF-PQ encode-time
  * `aggregate(zip_with(slice(cent, off+1, n), element_at(cbArr, code+1),
  * (c, r) => (c.double + r.double)²), 0.0, +)` as one compiled loop:
  * the codebook (16 × n float-rounded doubles) ships once per task via
  * `addReferenceObj` and the per-row `code` column picks the row —
  * the dynamic-index shape [[PqSubKernel]]'s constant-centroid form
  * cannot express. Bit-identical accumulation (left fold from 0.0,
  * float-rounded codebook components — `cb(k)(i).toFloat.toDouble`,
  * exactly the `pqCentroidLit` array<float> cast back to double);
  * a short/null-holding window or an out-of-range code yields NULL
  * exactly as the HOF chain did (zip_with null padding; element_at
  * past the end).
  */
case class PqReconNorm(left: Expression, right: Expression, offset: Int,
                       codebook: Array[Array[Double]])
    extends BinaryExpression {
  override def prettyName: String = "pq_recon_norm"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Float-rounded codebook rows flattened to one double[] (row-major,
    * subDim per row) — the pqCentroidLit protocol.
    */
  private lazy val subDim: Int = codebook.headOption.map(_.length).getOrElse(0)
  private lazy val cbF: Array[Double] =
    codebook.flatten.map(v => v.toFloat.toDouble)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<FLOAT>, INT), got " +
            s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val code = r.asInstanceOf[Int]
    if (code < 0 || code >= codebook.length) return null
    if (a.numElements() < offset + subDim) return null
    var acc = 0.0
    var i = 0
    while (i < subDim) {
      if (a.isNullAt(offset + i)) return null
      val v = a.getFloat(offset + i).toDouble + cbF(code * subDim + i)
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, code) => {
      val cb = ctx.addReferenceObj("cb", cbF, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |if ($code < 0 || $code >= ${codebook.length} ||
         |    $a.numElements() < ${offset + subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $subDim; $i++) {
         |    if ($a.isNullAt($offset + $i)) { ${ev.isNull} = true; break; }
         |    double $v = (double) $a.getFloat($offset + $i)
         |      + $cb[$code * $subDim + $i];
         |    $acc += $v * $v;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqKernels {
  def pq_sub_l2(a: Column, offset: Int, cent: Array[Double]): Column =
    GraftSqlBridge.column(PqSubL2(GraftSqlBridge.expression(a), offset, cent))
  def pq_sub_dot(a: Column, offset: Int, cent: Array[Double]): Column =
    GraftSqlBridge.column(PqSubDot(GraftSqlBridge.expression(a), offset, cent))
  def arr_float_sub(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrFloatSub(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def arr_float_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrFloatDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def pq_recon_norm(cent: Column, code: Column, offset: Int,
                    codebook: Array[Array[Double]]): Column =
    GraftSqlBridge.column(PqReconNorm(
      GraftSqlBridge.expression(cent), GraftSqlBridge.expression(code),
      offset, codebook))
}
