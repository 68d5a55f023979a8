package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native PQ subspace kernels must equal the higher-order forms
  * they replaced BIT-FOR-BIT (PQ codes are argmins over these values —
  * one flipped ulp flips a code and every downstream gate hash), and
  * must reproduce the HOF null semantics on the edges (short array,
  * null element, null array).
  */
class PqKernelsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("pq-kernels").getOrCreate()

  private val dim = 16

  /** The exact HOF text the kernels replaced. */
  private def hofL2(a: org.apache.spark.sql.Column, off: Int,
                    cent: Array[Double]) = {
    val centLit = array(cent.map(v => lit(v.toFloat)): _*)
      .cast("array<float>")
    aggregate(zip_with(slice(a, off + 1, dim), centLit, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)
  }
  private def hofDot(a: org.apache.spark.sql.Column, off: Int,
                     cent: Array[Double]) = {
    val centLit = array(cent.map(v => lit(v.toFloat)): _*)
      .cast("array<float>")
    aggregate(zip_with(slice(a, off + 1, dim), centLit,
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
  }

  test("native kernels equal the HOF forms bit-for-bit on 64-dim rows") {
    import spark.implicits._
    // deterministic pseudo-random floats incl. negatives and ties
    val rows = (0 until 257).map { r =>
      (r.toLong, (0 until 64).map(i =>
        (((r * 131 + i * 17) % 101) - 50) / 7.0f).toArray)
    }
    val df = rows.toDF("vec_id", "emb")
    val cent = (0 until dim).map(i => (i * 13 % 29 - 14) / 3.0).toArray
    val got = df.select(
        PqKernels.pq_sub_l2(col("emb"), 16, cent).as("l2n"),
        hofL2(col("emb"), 16, cent).as("l2h"),
        PqKernels.pq_sub_dot(col("emb"), 48, cent).as("dotn"),
        hofDot(col("emb"), 48, cent).as("doth"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"l2 mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"dot mismatch: ${r.getDouble(2)} vs ${r.getDouble(3)}")
    }
  }

  test("edge semantics match the HOF: short array and null array go null") {
    import spark.implicits._
    val cent = Array.fill(dim)(1.5)
    val df = Seq(
      (1L, Some((0 until 64).map(_.toFloat).toArray)), // full
      (2L, Some((0 until 20).map(_.toFloat).toArray)), // short
      (3L, Option.empty[Array[Float]])                 // null
    ).toDF("vec_id", "emb")
    val out = df.select(col("vec_id"),
        PqKernels.pq_sub_l2(col("emb"), 16, cent).as("n"),
        hofL2(col("emb"), 16, cent).as("h"))
      .orderBy(col("vec_id")).collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(0).getDouble(1) == out(0).getDouble(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("interpreted eval path agrees with codegen") {
    import spark.implicits._
    val cent = (0 until dim).map(i => i / 5.0).toArray
    val arr = (0 until 64).map(i => (i - 30) / 9.0f).toArray
    def run(mode: String): Double = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try Seq((1L, arr)).toDF("vec_id", "emb")
        .select(PqKernels.pq_sub_l2(col("emb"), 32, cent))
        .collect()(0).getDouble(0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(java.lang.Double.doubleToRawLongBits(run("NO_CODEGEN")) ==
      java.lang.Double.doubleToRawLongBits(run("CODEGEN_ONLY")))
  }
}
