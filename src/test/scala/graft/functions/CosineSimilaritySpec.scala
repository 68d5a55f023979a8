package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CosineSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("matches the zip_with+aggregate formulation bit-for-bit on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.alias("a").join(e.alias("b"),
      col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 20)
    val composed = expr(
      """aggregate(zip_with(a.embedding, b.embedding,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
        |/ (sqrt(aggregate(a.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |  * sqrt(aggregate(b.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |""".stripMargin)
    val rows = pairs.select(
      GraftFunctions.cosine_similarity(col("a.embedding"), col("b.embedding")).as("native"),
      composed.as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val v = spark.sql(
      """SELECT cosine_similarity(a.embedding, a.embedding) AS c
        |FROM emb a WHERE a.vec_id = 0""".stripMargin).head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("edge cases: zero vector -> 0, mismatched lengths -> null") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Array(0f, 0f), Array(1f, 2f)),
      (Array(1f, 0f, 5f), Array(1f, 0f))).toDF("a", "b")
    val got = df.select(
      GraftFunctions.cosine_similarity(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 0.0) // zero vector → 0
    assert(got(1).isNullAt(0))         // dimension mismatch → null
  }
}
