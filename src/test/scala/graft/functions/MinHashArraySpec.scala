package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MinHashArraySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val prime = 2038074743L

  test("per-row signature equals the MinHashAgg signature on real shingles") {
    // the ONE shingling definition (shared with d03-d08), both
    // signature forms side by side
    val docs = graft.operators.DedupQueries
      .shingleArrays(spark, "/root/testdata/sf0.001")
    val perRow = docs.select(col("doc_id"),
      MinHashArray.minhash_array(
        expr(s"transform(sh, x -> pmod(xxhash64(x), ${prime}L))"),
        64, 42L, prime).as("sig"))
    val agg = docs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), pmod(xxhash64(col("s")), lit(prime)).as("h"))
      .groupBy(col("doc_id"))
      .agg(MinHashAgg.minhash(col("h"), 64, 42L, prime).as("sig"))
    val mismatches = perRow.alias("a").join(agg.alias("b"), "doc_id")
      .filter(col("a.sig") =!= col("b.sig")).count()
    assert(mismatches == 0)
    assert(perRow.count() > 0)
  }

  test("empty input yields an all-MaxValue signature; interpreted == codegen") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Seq.empty[Long], Seq(7L, 11L)).toDF("hs")
    val rows = df.select(
      MinHashArray.minhash_array(col("hs"), 8, 42L, prime).as("sig"))
      .collect()
    assert(rows(0).getSeq[Long](0).forall(_ == Long.MaxValue))
    // interpreted path agrees with the codegen'd result
    val expr0 = MinHashArray(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7L, 11L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      8, 42L, prime)
    val interp = expr0.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(interp.toSeq == rows(1).getSeq[Long](0))
  }
}
