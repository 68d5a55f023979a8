package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("greatest right time <= left time, per key; ties match; no-match is null") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq(
      (1L, 5L, "early"),   // before any right row of key 1 → null
      (1L, 10L, "tie"),    // right row exactly at 10 → matches it
      (1L, 20L, "late"),   // rights at 10, 15 → picks 15
      (2L, 7L, "otherKey") // key 2 has right at 3 → picks it
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 99L, 9.0),
      (2L, 3L, 3.0), (3L, 1L, 4.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[Any]("asof_t")), Option(r.getAs[Any]("asof_v")))))
      .toMap
    assert(out("early") == (None, None))
    assert(out("tie") == (Some(10L), Some(1.0)))
    assert(out("late") == (Some(15L), Some(2.0)))
    assert(out("otherKey") == (Some(3L), Some(3.0)))
  }

  test("plan shape: one shuffle exchange, no range-pair join") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 5L)).toDF("k", "t")
    val right = Seq((1L, 3L, 1.0)).toDF("k", "t", "v")
    val plan = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
  }
}
