package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native IVF-PQ kernels (residual, full-length dot, dynamic-code
  * reconstruction norm) must equal the higher-order forms they replaced
  * BIT-FOR-BIT — codes and ADC cosines feed argmins/rank windows, so
  * one flipped ulp flips a gate hash — and must reproduce the HOF null
  * semantics on the edges (short array, null element, null array,
  * mismatched lengths, out-of-range code). Interpreted and codegen
  * paths must agree (PqKernelsSpec's protocol, extended to the
  * binary/dynamic-index shapes).
  */
class IvfPqKernelsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("ivfpq-kernels").getOrCreate()

  private val subDim = 16

  /** The exact HOF texts the kernels replaced. */
  private def hofSub(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")).cast("float"))
  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def hofNorm2(a: org.apache.spark.sql.Column) =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  private def hofRecon(cent: org.apache.spark.sql.Column,
                       code: org.apache.spark.sql.Column, mi: Int,
                       cb: Array[Array[Double]]) = {
    val cbArr = array(cb.map(c =>
      array(c.map(v => lit(v.toFloat)): _*).cast("array<float>")): _*)
    aggregate(zip_with(slice(cent, mi * subDim + 1, subDim),
      element_at(cbArr, code + 1),
      (c, r) => {
        val v = c.cast("double") + r.cast("double"); v * v
      }), lit(0.0), (acc, v) => acc + v)
  }

  private def rows64(n: Int) = (0 until n).map { r =>
    (r.toLong, (0 until 64).map(i =>
      (((r * 131 + i * 17) % 101) - 50) / 7.0f).toArray,
      (0 until 64).map(i =>
        (((r * 37 + i * 23) % 89) - 44) / 5.0f).toArray,
      r % 16)
  }

  test("arr_float_sub / arr_float_dot equal the HOFs bit-for-bit") {
    import spark.implicits._
    val df = rows64(257).toDF("vec_id", "a", "b", "code")
    val got = df.select(
        PqKernels.arr_float_sub(col("a"), col("b")).as("subn"),
        hofSub(col("a"), col("b")).as("subh"),
        PqKernels.arr_float_dot(col("a"), col("b")).as("dotn"),
        hofDot(col("a"), col("b")).as("doth"),
        PqKernels.arr_float_dot(col("a"), col("a")).as("n2n"),
        hofNorm2(col("a")).as("n2h"))
      .collect()
    got.foreach { r =>
      val sn = r.getSeq[Float](0)
      val sh = r.getSeq[Float](1)
      assert(sn.length == sh.length)
      sn.zip(sh).foreach { case (x, y) =>
        assert(java.lang.Float.floatToRawIntBits(x) ==
          java.lang.Float.floatToRawIntBits(y), s"sub mismatch: $x vs $y")
      }
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"dot mismatch: ${r.getDouble(2)} vs ${r.getDouble(3)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)),
        s"norm2 mismatch: ${r.getDouble(4)} vs ${r.getDouble(5)}")
    }
  }

  test("pq_recon_norm equals the dynamic-index HOF chain bit-for-bit") {
    import spark.implicits._
    val cb: Array[Array[Double]] = Array.tabulate(16)(k =>
      (0 until subDim).map(i => ((k * 31 + i * 7) % 37 - 18) / 3.0).toArray)
    val df = rows64(257).toDF("vec_id", "cent", "b", "code")
    (0 until 4).foreach { mi =>
      val got = df.select(
          PqKernels.pq_recon_norm(col("cent"), col("code").cast("int"),
            mi * subDim, cb).as("n"),
          hofRecon(col("cent"), col("code").cast("int"), mi, cb).as("h"))
        .collect()
      got.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"recon mismatch at mi=$mi: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("edge semantics match the HOFs: short/null arrays, null code") {
    import spark.implicits._
    val cb: Array[Array[Double]] = Array.tabulate(16)(k =>
      Array.fill(subDim)(k / 2.0))
    val full = (0 until 64).map(_.toFloat).toArray
    val short = (0 until 20).map(_.toFloat).toArray
    val df = Seq(
      (1L, Some(full), Some(full), Some(3)),
      (2L, Some(short), Some(full), Some(3)),   // mismatched lengths
      (3L, Option.empty[Array[Float]], Some(full), Some(3)), // null array
      (4L, Some(full), Some(full), Option.empty[Int])        // null code
    ).toDF("vec_id", "a", "b", "code")
    val out = df.select(col("vec_id"),
        PqKernels.arr_float_sub(col("a"), col("b")).as("subn"),
        hofSub(col("a"), col("b")).as("subh"),
        PqKernels.arr_float_dot(col("a"), col("b")).as("dotn"),
        hofDot(col("a"), col("b")).as("doth"),
        PqKernels.pq_recon_norm(col("a"), col("code"), 16, cb).as("rn"),
        hofRecon(col("a"), col("code"), 1, cb).as("rh"))
      .orderBy(col("vec_id")).collect()
    // full row: everything defined and equal
    assert(!out(0).isNullAt(3) && !out(0).isNullAt(4) &&
      out(0).getDouble(3) == out(0).getDouble(4))
    assert(!out(0).isNullAt(5) && !out(0).isNullAt(6) &&
      out(0).getDouble(5) == out(0).getDouble(6))
    // mismatched lengths: sub pads with nulls (both forms), dot nulls
    val sn = out(1).getSeq[Any](1); val sh = out(1).getSeq[Any](2)
    assert(sn.length == sh.length && sn.length == 64)
    assert(sn.count(_ == null) == sh.count(_ == null) &&
      sn.count(_ == null) == 44)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
    // short array: recon norm nulls (both forms)
    assert(out(1).isNullAt(5) && out(1).isNullAt(6))
    // null array propagates
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) &&
      out(2).isNullAt(3) && out(2).isNullAt(4) &&
      out(2).isNullAt(5) && out(2).isNullAt(6))
    // null code propagates
    assert(out(3).isNullAt(5) && out(3).isNullAt(6))
  }

  test("interpreted evaluation agrees with codegen") {
    import spark.implicits._
    val cb: Array[Array[Double]] = Array.tabulate(16)(k =>
      (0 until subDim).map(i => (k + i) / 3.0).toArray)
    val df = rows64(64).toDF("vec_id", "a", "b", "code")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(
          PqKernels.arr_float_sub(col("a"), col("b")).as("s"),
          PqKernels.arr_float_dot(col("a"), col("b")).as("d"),
          PqKernels.pq_recon_norm(col("a"), col("code").cast("int"), 32, cb)
            .as("r"))
        .collect()
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val int = run("NO_CODEGEN")
    gen.zip(int).foreach { case (g, i) =>
      g.getSeq[Float](0).zip(i.getSeq[Float](0)).foreach { case (x, y) =>
        assert(java.lang.Float.floatToRawIntBits(x) ==
          java.lang.Float.floatToRawIntBits(y))
      }
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(i.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(i.getDouble(2)))
    }
  }
}
