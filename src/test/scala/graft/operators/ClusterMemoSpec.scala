package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The cluster-label memo must key on the dir (independent labels per
  * dir), serve the SAME handle on a repeat call (that's the point of the
  * memo), and recompute from current data after an explicit
  * invalidation — the lifecycle a long-lived session mutating corpora
  * relies on.
  */
class ClusterMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    val spark2 = spark
    import spark2.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def labelMap(dir: String): Map[Long, Long] =
    DedupQueries.clusterLabels(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id"))
      .toMap

  test("labels are per-dir, memoized, and recompute after invalidation") {
    val near1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near2 = near1 + " lambda"
    val far = "completely different words about another topic entirely here now"

    val dirA = Files.createTempDirectory("memoA").toString
    val dirB = Files.createTempDirectory("memoB").toString
    writeDocs(dirA, Seq((1L, near1), (2L, near2), (3L, far)))
    writeDocs(dirB, Seq((10L, near1), (11L, near2), (12L, far)))

    // independent labels per dir: each clusters ITS near-dup pair
    // (singletons never enter the pair graph, so only clustered docs
    // carry labels — d06/d07 treat absent docs as their own cluster)
    val a = labelMap(dirA)
    val b = labelMap(dirB)
    assert(a(1L) == a(2L) && a.keySet === Set(1L, 2L), s"dirA labels: $a")
    assert(b(10L) == b(11L) && b.keySet === Set(10L, 11L), s"dirB labels: $b")

    // memo hit: same handle back, no recompute
    assert(DedupQueries.clusterLabels(spark, dirA) eq
      DedupQueries.clusterLabels(spark, dirA))

    // rewrite dirA so the near-dup pair disappears; the memo is stale
    // until explicitly invalidated, then recomputes from current data
    writeDocs(dirA, Seq((1L, near1), (2L, far), (3L, "yet more unrelated text goes in this third document")))
    assert(labelMap(dirA) === a, "memo unexpectedly recomputed without invalidation")
    DedupQueries.invalidateClusterLabels(spark, dirA)
    val a2 = labelMap(dirA)
    assert(a2.isEmpty, s"recomputed labels still cluster the old pair: $a2")
    // dirB's memo survived dirA's invalidation
    assert(DedupQueries.clusterLabels(spark, dirB) eq
      DedupQueries.clusterLabels(spark, dirB))
  }

  test("a compute in flight across an invalidation does not re-insert stale labels") {
    val dir = Files.createTempDirectory("memoGen").toString
    writeDocs(dir, Seq((1L, "alpha beta gamma delta epsilon zeta")))

    // replay the race deterministically: a compute observes the
    // generation, the dir is invalidated mid-compute, then the compute
    // tries to put — the put must be refused, so the NEXT call
    // recomputes from post-invalidation data as documented
    val genBefore = DedupQueries.labelGeneration(spark, dir)
    val staleLabels = DedupQueries.clusterLabels(spark, dir) // any frame works
    DedupQueries.invalidateClusterLabels(spark, dir)
    assert(!DedupQueries.putLabelsIfCurrent(spark, dir, genBefore, staleLabels),
      "stale put accepted after invalidation")
    // fresh compute at the CURRENT generation is accepted and memoized
    val l1 = DedupQueries.clusterLabels(spark, dir)
    assert(l1 eq DedupQueries.clusterLabels(spark, dir))
  }

  test("e07 assignment memo: stale after rewrite until invalidateAssigned; in-flight puts refused") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("assignedMemo").toString
    val src = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def verdicts(): Long =
      SimilarityQueries.e07SemanticDedup.fn(spark, dir).count()

    // one verdict row per corpus vector
    val full = verdicts()
    assert(full == src.count())

    // rewrite the dir to HALF the corpus: the memoized assignment is
    // a materialized handle (localCheckpoint), so without invalidation
    // the memo keeps serving the old assignment's row set
    val half = src.filter(org.apache.spark.sql.functions
      .col("vec_id") % 2 === 0)
    half.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    SimilarityQueries.invalidateAssigned(spark, dir)
    assert(verdicts() == half.count(),
      "post-invalidation e07 must recompute from the rewritten corpus")

    // the invalidate-during-compute race, replayed deterministically:
    // a compute that observed the OLD generation must not re-insert
    val genBefore = SimilarityQueries.assignedGeneration(spark, dir)
    SimilarityQueries.invalidateAssigned(spark, dir)
    assert(!SimilarityQueries.putAssignedIfCurrent(spark, dir, genBefore,
      half.toDF()),
      "stale assignment put accepted after invalidation")
    // current-generation put is accepted
    assert(SimilarityQueries.putAssignedIfCurrent(spark, dir,
      SimilarityQueries.assignedGeneration(spark, dir), half.toDF()))
    SimilarityQueries.invalidateAssigned(spark, dir)
  }
}
