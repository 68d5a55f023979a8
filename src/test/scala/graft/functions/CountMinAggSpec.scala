package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Count-Min Sketch invariants that the t19 gate can't directly state:
  * estimates NEVER undercount (the one-sided error guarantee), and the
  * sketch is partitioning-invariant (merge = elementwise add is
  * associative/commutative, so 1-partition and 8-partition runs build
  * the identical buffer — the map-side-combine property).
  */
class CountMinAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val depth = 4
  private val width = 8 // tiny → collisions guaranteed
  private val seed = 7L
  private val prime = 2038074743L

  test("estimates never undercount and equal exact counts absent collisions") {
    val spark2 = spark
    import spark2.implicits._
    // skewed multiset: value v appears (v % 17) + 1 times, v in 0..99
    val rows = (0L until 100L).flatMap(v => Seq.fill((v % 17).toInt + 1)(v))
    val df = rows.toDF("v").withColumn("hp", pmod(col("v") * 2654435761L, lit(prime)))

    val cms = df.agg(CountMinAgg.count_min(col("hp"), depth, width, seed, prime))
      .collect()(0).getSeq[Long](0)
    assert(cms.length === depth * width)
    assert(cms.sum === depth * rows.length, "every update increments one cell per row")

    val (a, b) = MinHashArray.coefficients(depth, seed)
    def estimate(hp: Long): Long =
      (0 until depth).map(i =>
        cms(i * width + (((hp * a(i) + b(i)) % prime) % width).toInt)).min

    val exact = rows.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    exact.foreach { case (v, n) =>
      val hp = java.lang.Math.floorMod(v * 2654435761L, prime)
      assert(estimate(hp) >= n, s"undercount for v=$v: ${estimate(hp)} < $n")
    }
  }

  test("sketch is identical under different partitionings") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0L until 500L).map(v => v % 37)
    def sketch(parts: Int): Seq[Long] =
      rows.toDF("v").repartition(parts)
        .withColumn("hp", pmod(col("v") * 2654435761L, lit(prime)))
        .agg(CountMinAgg.count_min(col("hp"), depth, width, seed, prime))
        .collect()(0).getSeq[Long](0)
    assert(sketch(1) === sketch(8))
  }
}
