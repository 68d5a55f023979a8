package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The quadratic-baseline guard must TRIP above the configured row
  * threshold, pass under it, and yield to the explicit opt-in — so a
  * composition can never silently run d03/e02's O(n²) join on a
  * corpus-sized input, while the sf gates (well under the default
  * 50 000) stay green.
  */
class QuadraticGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("d03 trips above the threshold and runs with the opt-in") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("quadguard").toString
    (0L until 20L).map(i => (i, s"doc number $i with some shared words"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    withConf("spark.graft.quadraticMaxRows" -> "10") {
      val ex = intercept[IllegalArgumentException] {
        DedupQueries.d03NgramJaccard.fn(spark, dir)
      }
      assert(ex.getMessage.contains("d04/d08/d09"))
      assert(ex.getMessage.contains("quadratic"))
    }
    withConf("spark.graft.quadraticMaxRows" -> "10",
      "spark.graft.allowQuadratic" -> "true") {
      // opt-in bypasses the guard entirely (no count, no throw)
      DedupQueries.d03NgramJaccard.fn(spark, dir).collect()
    }
    // default threshold (50 000) passes 20 rows untouched
    DedupQueries.d03NgramJaccard.fn(spark, dir).collect()
  }

  test("nearDupClusters trips above the threshold; the df-capped variant does not") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 20L)
      .map(i => (i, s"document body number $i with several common tokens"))
      .toDF("doc_id", "text")

    withConf("spark.graft.quadraticMaxRows" -> "10") {
      val ex = intercept[IllegalArgumentException] {
        graft.api.Graft.nearDupClusters(docs)
      }
      assert(ex.getMessage.contains("maxDocFreq"))
      assert(ex.getMessage.contains("quadratic"))
      // the capped variant IS the scale path — no fence, runs clean
      graft.api.Graft.nearDupClusters(docs, maxDocFreq = 100).collect()
    }
    withConf("spark.graft.quadraticMaxRows" -> "10",
      "spark.graft.allowQuadratic" -> "true") {
      graft.api.Graft.nearDupClusters(docs).collect()
    }
    // default threshold (50 000) passes 20 rows untouched
    graft.api.Graft.nearDupClusters(docs).collect()
  }

  test("e02 trips above the threshold") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("quadguard_e").toString
    (0L until 20L).map(i => (i, Array.fill(4)(i.toFloat), i % 3))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    withConf("spark.graft.quadraticMaxRows" -> "10") {
      val ex = intercept[IllegalArgumentException] {
        SimilarityQueries.e02CosineNearDup.fn(spark, dir)
      }
      assert(ex.getMessage.contains("e02_cosine_neardup"))
    }
  }
}
