package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The d09 band-bucket population cap under deliberate skew: a
  * boilerplate clique larger than the cap (the degenerate case that
  * turns d04's bucket self-join quadratic at web scale) must be
  * excluded from candidate generation, while ordinary near-dup pairs
  * pass through untouched. The sf-gate (CORRECTNESS d09 row) checks
  * cap semantics cross-engine; this spec checks the cap BINDS.
  */
class DedupCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("d09 drops hot-bucket boilerplate cliques that d04 would join") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("capdocs").toString
    // 80 identical docs: every band bucket of the clique holds 80 > 50
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    // an ordinary near-dup pair (8 shared of 9 shingles, J = 0.8889)
    val near1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near2 = near1 + " lambda"
    val docs = (0L until 80L).map(i => (i, boiler)) ++
      Seq((100L, near1), (101L, near2))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val uncapped = DedupQueries.d04MinHashLsh.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val capped = DedupQueries.d09MinHashCapped.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet

    // d04 joins the whole clique: (80 choose 2) pairs + the normal pair
    assert(uncapped.size == 80 * 79 / 2 + 1)
    assert(uncapped.contains((100L, 101L)))
    // d09: the clique's buckets are all over the cap -> only the normal
    // pair survives; fan-out stayed bounded at (cap choose 2) per bucket
    assert(capped == Set((100L, 101L)),
      s"cap failed to drop the boilerplate clique: $capped")
  }

  test("d15's benchMaxDocId pins the benchmark side (fixed-eval deployment shape)") {
    val dir = Files.createTempDirectory("decondocs").toString
    val spark2 = spark
    import spark2.implicits._
    // bench candidates (doc_id % 10 == 0): 10 and 20; train: the rest.
    // Two identical train↔bench pairs, one on each side of the cap.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    Seq((10L, a), (13L, a), (20L, b), (7L, b), (5L, "lorem ipsum dolor sit amet"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run(): Set[(Long, Long)] =
      DedupQueries.d15CrossDecontamination.fn(spark, dir).collect()
        .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id"))).toSet

    val uncapped = run()
    assert(uncapped == Set((13L, 10L), (7L, 20L)), s"uncapped: $uncapped")

    // cap at 10: doc 20 stops being a benchmark and joins the TRAINING
    // side — its pair with train 7 disappears, and as a train doc it
    // matches no remaining benchmark; only (13, 10) survives. This is
    // the ScaleBench shape: replicas (high ids) can only ever GROW the
    // screened corpus, never the eval set.
    spark.conf.set("spark.graft.benchMaxDocId", "10")
    try {
      val capped = run()
      assert(capped == Set((13L, 10L)), s"capped: $capped")
    } finally spark.conf.unset("spark.graft.benchMaxDocId")

    // a cap above every id is a no-op — the x1 ScaleBench cell measures
    // the same query the gate verifies
    spark.conf.set("spark.graft.benchMaxDocId", "1000000")
    try assert(run() == uncapped, "high cap must be a no-op")
    finally spark.conf.unset("spark.graft.benchMaxDocId")
  }

  test("d17's benchMaxDocId caps the benchmark side; above-range cap is a no-op") {
    val d = "/root/testdata/sf0.001"
    def run(): Set[(Long, Long)] =
      DedupQueries.d17SemanticDecontamination.fn(spark, d).collect()
        .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id")))
        .toSet
    val uncapped = run()
    assert(uncapped.nonEmpty)
    // a cap excludes high-id eval vectors from the BENCH side: every
    // surviving bench_id is within range; pairs against in-range
    // benchmarks all survive (their train side is unchanged); and any
    // NEW pair's train side is an excluded eval vector that rejoined
    // the training corpus — exactly the semantics ScaleBench relies on
    val cap = uncapped.map(_._2).max - 1
    spark.conf.set("spark.graft.benchMaxDocId", cap.toString)
    try {
      val capped = run()
      assert(capped.forall(_._2 <= cap), s"bench above cap: $capped")
      assert(uncapped.filter(_._2 <= cap).subsetOf(capped),
        "in-range pairs must survive the cap")
      assert((capped -- uncapped).forall(p =>
        p._1 % 10 == 0 && p._1 > cap),
        "new pairs may only come from evicted eval vectors")
    } finally spark.conf.unset("spark.graft.benchMaxDocId")
    spark.conf.set("spark.graft.benchMaxDocId", "1000000")
    try assert(run() == uncapped, "high cap must be a no-op")
    finally spark.conf.unset("spark.graft.benchMaxDocId")
  }

  test("mm08 honors the same phashBucketCap conf as mm07") {
    val d = "/root/testdata/sf0.001"
    def run(): Set[(Long, Long)] =
      MultimodalQueries.mm08AudioFpDedup.fn(spark, d).collect()
        .map(r => (r.getAs[Long]("ma"), r.getAs[Long]("mb"))).toSet
    val uncapped = run()
    assert(uncapped.nonEmpty)
    // cap=1: every multi-member band bucket is skipped -> no pairs
    spark.conf.set("spark.graft.phashBucketCap", "1")
    try assert(run().isEmpty, "cap=1 must suppress every candidate bucket")
    finally spark.conf.unset("spark.graft.phashBucketCap")
    // a cap above every bucket population is a no-op
    spark.conf.set("spark.graft.phashBucketCap", "1000000")
    try assert(run() == uncapped, "high cap must be a no-op")
    finally spark.conf.unset("spark.graft.phashBucketCap")
  }

  test("mm09 honors the same phashBucketCap conf as mm07/mm08") {
    val d = "/root/testdata/sf0.001"
    def run(): Set[(Long, Long)] =
      MultimodalQueries.mm09VideoNearDup.fn(spark, d).collect()
        .map(r => (r.getAs[Long]("ma"), r.getAs[Long]("mb"))).toSet
    val uncapped = run()
    assert(uncapped.nonEmpty)
    // cap=1: every multi-member (position, band, chunk) bucket is
    // skipped -> no candidates at all
    spark.conf.set("spark.graft.phashBucketCap", "1")
    try assert(run().isEmpty, "cap=1 must suppress every candidate bucket")
    finally spark.conf.unset("spark.graft.phashBucketCap")
    // a cap above every bucket population is a no-op
    spark.conf.set("spark.graft.phashBucketCap", "1000000")
    try assert(run() == uncapped, "high cap must be a no-op")
    finally spark.conf.unset("spark.graft.phashBucketCap")
  }

  test("mm07's phashBucketCap bounds pair output on a hyper-duplicated corpus") {
    val d = "/root/testdata/sf0.001"
    def run(): Set[(Long, Long)] =
      MultimodalQueries.mm07PerceptualHashDedup.fn(spark, d).collect()
        .map(r => (r.getAs[Long]("ma"), r.getAs[Long]("mb"))).toSet
    val uncapped = run()
    // 148, up from 141 under round 7's 4×16-bit banding: the 5-band
    // 13/13/13/13/12-bit layout is pigeonhole-complete for Hamming ≤ 4,
    // recovering the 7 true distance-4 pairs whose differing bits
    // straddled all four wide bands (the recall hole the round-8 fix
    // closed)
    assert(uncapped.size == 148, s"gate output drifted: ${uncapped.size}")
    // cap at 1: every multi-member bucket is skipped -> no pairs at all
    // (the degenerate bound; production would cap in the hundreds)
    spark.conf.set("spark.graft.phashBucketCap", "1")
    try {
      assert(run().isEmpty, "cap=1 must suppress every candidate bucket")
    } finally spark.conf.unset("spark.graft.phashBucketCap")
    // a cap above every bucket population is a no-op: same output as
    // the gate
    spark.conf.set("spark.graft.phashBucketCap", "1000000")
    try assert(run() == uncapped, "high cap must be a no-op")
    finally spark.conf.unset("spark.graft.phashBucketCap")
  }

  test("capped nearDupClusters equals the exact path when no shingle exceeds the cap") {
    val spark2 = spark
    import spark2.implicits._
    // two 3-doc near-dup chains + singles; every shingle's df is <= 3
    val base1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val base2 = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (1L, base1), (2L, base1 + " lambda"), (3L, base1 + " lambda mu"),
      (10L, base2), (11L, base2 + " twelve"),
      (20L, "totally unrelated words that share nothing with others at all"))
      .toDF("doc_id", "text")
    def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("canonical_id"))).toSet
    val exact = labels(graft.api.Graft.nearDupClusters(docs))
    val capped = labels(graft.api.Graft.nearDupClusters(docs, maxDocFreq = 3))
    assert(capped == exact,
      s"cap above every shingle's df must be a no-op: $capped vs $exact")
    assert(exact.nonEmpty)
  }

  test("capped nearDupClusters drops pairs held together only by over-cap shingles") {
    val spark2 = spark
    import spark2.implicits._
    // a hot 3-token boilerplate phrase shared by EVERY doc; docs 1/2
    // are real near-dups beyond it, docs 10/11 share ONLY the phrase
    // (their Jaccard over capped shingles is 0) — the scale-killer
    // shape: one stop-phrase shingle fanning out k² pairs
    val hot = "click here now"
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$a $hot"), (2L, s"$a extra $hot"),
      (10L, s"completely different text body one $hot"),
      (11L, s"some other unrelated words entirely two $hot"))
      .toDF("doc_id", "text")
    val capped = graft.api.Graft.nearDupClusters(docs, maxDocFreq = 3)
      .collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("canonical_id"))).toSet
    // 1-2 still cluster on their real overlap; 10/11 must NOT appear
    // (their only common shingle is the over-cap hot phrase)
    assert(capped.contains((1L, 1L)) && capped.contains((2L, 1L)),
      s"real near-dups lost under the cap: $capped")
    assert(!capped.exists(p => p._1 == 10L || p._1 == 11L),
      s"hot-shingle-only pair survived the cap: $capped")
  }
}
