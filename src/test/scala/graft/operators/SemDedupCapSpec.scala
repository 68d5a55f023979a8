package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The e07 cell-population cap under deliberate skew: a degenerate cell
  * of near-identical embeddings larger than the cap (what a web corpus
  * produces for boilerplate pages) must be excluded from the pairwise
  * self-join — all its members keep=true and zero pairs are generated —
  * while an ordinary under-cap cell dedups exactly as before. The
  * sf-gate (CORRECTNESS e07 row) checks cap semantics cross-engine;
  * this spec checks the cap BINDS.
  */
class SemDedupCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def vec(head: Float): Array[Float] =
    Array.tabulate(4)(i => if (i == 0) head else 1.0f)

  test("e07 cap excludes a degenerate cell while normal cells dedup") {
    val spark2 = spark
    import spark2.implicits._
    // cell 0: 30 near-identical vectors (every pair cosine ≈ 1 ≥ tau)
    // cell 1: two near-dups (keep the min id) + one orthogonal-ish keeper
    val rows =
      (0L until 30L).map(i => (i, 0, vec(1.0f + i * 1e-6f))) ++
        Seq((100L, 1, Array(1.0f, 1.0f, 1.0f, 1.0f)),
          (101L, 1, Array(1.0f, 1.0f, 1.0f, 0.99f)),
          (102L, 1, Array(-1.0f, -1.0f, 1.0f, 1.0f)))
    val assigned = rows.toDF("vec_id", "cell", "embedding")
      .select(col("vec_id"), col("embedding"), col("cell"))

    // cap = 10 < 30: cell 0 is degenerate and must contribute no pairs
    val verdicts = SimilarityQueries
      .semanticDedupVerdicts(assigned, tau = 0.9, cap = 10)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep"))
      .toMap

    assert(verdicts.size === 33)
    // degenerate cell: everyone kept (excluded from the join, not deduped)
    for (i <- 0L until 30L) assert(verdicts(i), s"vec $i in capped cell dropped")
    // normal cell: min-id representative survives, its near-dup drops,
    // the dissimilar vector survives
    assert(verdicts(100L) === true)
    assert(verdicts(101L) === false)
    assert(verdicts(102L) === true)

    // without the cap binding, the degenerate cell dedups to its min id —
    // proving the cap (not the data) produced the keeps above
    val uncapped = SimilarityQueries
      .semanticDedupVerdicts(assigned, tau = 0.9, cap = 1000)
      .filter(col("keep")).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(uncapped === Set(0L, 100L, 102L))
  }
}
