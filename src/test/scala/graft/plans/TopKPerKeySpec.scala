package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TopKPerKeySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("matches the window row_number formulation on real data") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // deterministic order: (-acctbal, custkey) ascending
    val got = TopK.perKey(c, Seq("c_nationkey"),
        struct(negate(col("c_acctbal")), col("c_custkey")), k = 3)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expected = c.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey", "c_acctbal")
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("physical plan: two TopKPerKeyExec phases, no sort") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val df = TopK.perKey(c, Seq("c_nationkey"), col("c_custkey"), k = 2)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan nodeName strips the Exec suffix
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, s"two phases expected:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"final phase must cluster by key:\n$plan")
    assert(!plan.contains("+- Sort"), s"no sort expected in plan:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopK.perKey(df, Seq("k"), col("v"), k = 100)
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1, 10), Seq(1, 20), Seq(2, 5)))
  }
}
