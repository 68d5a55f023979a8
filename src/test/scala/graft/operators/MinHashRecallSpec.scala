package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The derived-banding recall contract (round 9): minhashDedup's
  * banding adapts to the threshold, so the guaranteed-recall claim
  * holds BELOW the classic 0.8 regime too. Proven against the exact
  * quadratic baseline (d03's answer: every pair with shingle Jaccard
  * ≥ 0.5), which the round-8 fixed 16×4 banding missed ~36% of
  * per-pair — the spec that would have failed before the derivation.
  */
class MinHashRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("minhash-recall-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
      r.getAs[Double]("jaccard"))).toSet

  test("minhashDedup at threshold 0.5 equals the exact quadratic baseline") {
    val exact = pairs(DedupQueries.d03NgramJaccard.fn(spark, dir))
    val banded = pairs(graft.api.Graft.minhashDedup(docs, threshold = 0.5))
    assert(exact.nonEmpty, "fixture must produce J >= 0.5 pairs")
    assert(banded == exact,
      s"derived banding lost pairs: missing=${(exact -- banded).take(5)} " +
        s"extra=${(banded -- exact).take(5)}")
  }

  test("derived banding picks the documented (bands x rows) per threshold") {
    // the derivation rule, restated: widest rows with >= 99% recall at
    // J = threshold over r in {8, 4, 2, 1}
    def rowsFor(t: Double): Int = Seq(8, 4, 2, 1).find { r =>
      1.0 - math.pow(1.0 - math.pow(t, r), 64 / r) >= 0.99
    }.getOrElse(1)
    assert(rowsFor(0.8) == 4, "0.8 must keep the gate's classic 16x4")
    assert(rowsFor(0.5) == 2)
    assert(rowsFor(0.95) == 8)
    assert(rowsFor(0.2) == 1)
  }

  test("threshold binds monotonically under the derived banding") {
    val loose = graft.api.Graft.minhashDedup(docs, threshold = 0.5).count()
    val mid = graft.api.Graft.minhashDedup(docs, threshold = 0.8).count()
    val tight = graft.api.Graft.minhashDedup(docs, threshold = 0.95).count()
    assert(tight <= mid && mid <= loose && loose > 0)
  }
}
