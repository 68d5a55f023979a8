package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("matches every pair within tolerance exactly once, across bucket edges") {
    val spark2 = spark
    import spark2.implicits._
    // tolerance 10s; buckets are [0,10), [10,20)… — pairs straddling a
    // bucket boundary (l=9, r=11) must still meet, and only once
    val left = Seq((1L, ts(9), "a"), (1L, ts(25), "b"), (2L, ts(9), "c"))
      .toDF("k", "lt", "tag")
    val right = Seq((1L, ts(11)), (1L, ts(19)), (1L, ts(35)), (2L, ts(30)))
      .toDF("k", "rt")
    val got = RangeJoin.withinTolerance(left, right, "k", "lt", "rt", 10000000L)
      .select("tag", "rt").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000))
    assert(got.sorted.toSeq == Seq(("a", 11L), ("a", 19L), ("b", 19L), ("b", 35L)).sorted)
    // exact-boundary inclusion: |Δt| == tolerance qualifies
    val exact = RangeJoin.withinTolerance(
      Seq((1L, ts(20))).toDF("k", "lt"),
      Seq((1L, ts(10)), (1L, ts(30)), (1L, ts(41))).toDF("k", "rt"),
      "k", "lt", "rt", 10000000L).count()
    assert(exact == 2)
  }
}
