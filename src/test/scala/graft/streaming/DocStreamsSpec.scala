package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import DocStreams.Doc

/** Streaming MinHash-LSH candidates must behave like d04 across
  * micro-batches: a near-identical document arriving in a LATER batch
  * is flagged against the earlier bucket claimant (cross-batch keyed
  * state), an unrelated document is not flagged, and the batch path
  * agrees that the flagged pair really is a near-dup.
  */
class DocStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("near-dup arriving in a later batch is flagged against the first claimant") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base + " phi" // one extra token: J ≈ 0.86, LSH-certain
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    def at(min: Int) = Timestamp.valueOf(f"2026-01-01 09:$min%02d:00")

    val stream = MemoryStream[Doc]
    val q = DocStreams.nearDupCandidates(stream.toDS(), horizonMinutes = 10)
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(Seq(Doc(1L, at(0), base), Doc(2L, at(1), unrelated)))
    q.processAllAvailable()
    stream.addData(Seq(Doc(3L, at(3), nearDup)))
    q.processAllAvailable()
    q.stop()

    val hits = spark.table("neardup").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_doc"),
        r.getAs[Boolean]("is_dup_candidate")))
    // batch-1 docs claimed their buckets: no candidates among them
    assert(hits.filter(h => h._1 == 1L || h._1 == 2L).forall(!_._3))
    // doc 3 (later BATCH) flagged against doc 1 in at least one band
    val flagged = hits.filter(h => h._1 == 3L && h._3)
    assert(flagged.nonEmpty, s"near-dup not flagged: ${hits.toSeq}")
    assert(flagged.forall(_._2 == 1L), s"flagged against wrong doc: ${flagged.toSeq}")
    // and never against the unrelated doc
    assert(!hits.exists(h => h._1 == 3L && h._2 == 2L && h._3))
  }

  test("stream-candidates composed with batch verify equals the batch d04 pairs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base + " phi" // J ≈ 0.95 on 3-gram shingles: ≥0.8
    val farDup = base.replace("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight") // shares a suffix: LSH may
    // bucket it, exact verify must REJECT it (J < 0.8)
    val unrelated = "eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty twentyone twentytwo"
    def at(min: Int) = Timestamp.valueOf(f"2026-01-01 09:$min%02d:00")
    val docsSeq = Seq(Doc(1L, at(0), base), Doc(2L, at(1), unrelated),
      Doc(3L, at(2), farDup), Doc(4L, at(3), nearDup))

    val stream = MemoryStream[Doc]
    val q = DocStreams.nearDupCandidates(stream.toDS(), horizonMinutes = 10)
      .writeStream.format("memory").queryName("neardup_verify")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(docsSeq.take(2))
    q.processAllAvailable()
    stream.addData(docsSeq.drop(2))
    q.processAllAvailable()
    q.stop()

    val corpus = docsSeq.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val verified = DocStreams.verifyCandidates(
      spark.table("neardup_verify"), corpus).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard")))

    // batch d04 on the same corpus (written as a documents table)
    val dir = java.nio.file.Files.createTempDirectory("d04stream").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.operators.DedupQueries.d04MinHashLsh.fn(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard")))

    assert(verified.toSeq == batch.toSeq,
      s"stream∘verify=${verified.toSeq} batch=${batch.toSeq}")
    assert(verified.nonEmpty && verified.head._1 == 1L && verified.head._2 == 4L)
  }

  test("hot bucket demotes a claimant older than the horizon") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    def at(min: Int) = Timestamp.valueOf(f"2026-01-01 ${9 + min / 60}%02d:${min % 60}%02d:00")

    val stream = MemoryStream[Doc]
    val q = DocStreams.nearDupCandidates(stream.toDS(), horizonMinutes = 10)
      .writeStream.format("memory").queryName("neardup_hot")
      .outputMode(OutputMode.Append())
      .start()
    // doc 1 claims at t=0; doc 2 keeps the bucket hot at t=8 (within
    // horizon of doc 1 → flagged against 1, state re-armed); doc 3 at
    // t=25 is > 10 min past BOTH doc 1's and doc 2's event times, so even
    // though the re-armed timeout kept the state alive, the aged claimant
    // is demoted and doc 3 claims fresh — never reported against a
    // first_doc outside its own horizon
    stream.addData(Seq(Doc(1L, at(0), base)))
    q.processAllAvailable()
    stream.addData(Seq(Doc(2L, at(8), base)))
    q.processAllAvailable()
    stream.addData(Seq(Doc(3L, at(25), base)))
    q.processAllAvailable()
    q.stop()

    val hits = spark.table("neardup_hot").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_doc"),
        r.getAs[Boolean]("is_dup_candidate")))
    // within-horizon duplicate flagged against the original claimant
    assert(hits.exists(h => h._1 == 2L && h._2 == 1L && h._3), hits.toSeq)
    // beyond-horizon arrival: claimant demoted, doc 3 claims its buckets
    val d3 = hits.filter(_._1 == 3L)
    assert(d3.nonEmpty && d3.forall(h => h._2 == 3L && !h._3),
      s"stale claimant not demoted: ${d3.toSeq}")
  }

  test("streaming bloom-sketch ingest equals the batch sketch") {
    // d13's corpus sketch, fed continuously: because bloom insertion is
    // an idempotent bit_or, the streaming aggregate needs NO distinct
    // and NO keyed state beyond the word table itself — complete-mode
    // output after any number of micro-batches must equal sketching the
    // same documents in one batch pass. This is the ingest side of the
    // incremental story ScalePatternsSpec proves for batch merges.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupQueries.BloomSketch

    def at(min: Int) = Timestamp.valueOf(f"2026-01-01 09:$min%02d:00")
    val b1 = Seq(
      Doc(1L, at(0), "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      Doc(2L, at(1), "one two three four five six seven eight nine ten eleven twelve"))
    val b2 = Seq(
      Doc(3L, at(2), "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      Doc(4L, at(3), "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"))

    val stream = MemoryStream[Doc]
    val q = BloomSketch.sketchOf(
        BloomSketch.segmentHashesOf(stream.toDS().toDF()).select("h"))
      .writeStream.format("memory").queryName("bloom_ingest")
      .outputMode(OutputMode.Complete())
      .start()
    stream.addData(b1)
    q.processAllAvailable()
    stream.addData(b2)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("bloom_ingest").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val all = (b1 ++ b2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val batch = BloomSketch.sketchOf(
        BloomSketch.segmentHashesOf(all).select("h")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(streamed == batch,
      s"streaming ingest diverged: streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
  }

  test("streaming DSIR scoring with batch models equals batch t20") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"

    // models built once, batch-side; the stream replays the same corpus
    // split across two micro-batches, so every (doc, score) must match
    // batch t20 exactly (same rounded float — the stream folds tokens in
    // document order, the batch sums in shuffle order; the float-cast
    // round-4 protocol absorbs the ulp difference)
    val (lrMap, unseen) = graft.operators.TextAnalysisQueries.dsirModels(spark, d)
    assert(lrMap.size <= 1024 && lrMap.nonEmpty)

    val ts = Timestamp.valueOf("2026-01-01 09:00:00")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), ts, r.getString(1)))
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[Doc]
    val q = DocStreams.dsirScore(stream.toDS(), lrMap, unseen)
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(b1.toSeq)
    q.processAllAvailable()
    stream.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dsir_scores").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Float]("dsir_logweight"))).toSet
    val batch = graft.operators.TextAnalysisQueries.t20DsirWeights
      .fn(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Float]("dsir_logweight"))).toSet
    assert(streamed.size == docs.length)
    assert(streamed == batch,
      s"stream scores diverged from batch t20: " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }

  test("streaming quality-classifier scoring equals batch t21") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"

    val ts = Timestamp.valueOf("2026-01-01 09:00:00")
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), ts, r.getString(1)))
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[Doc]
    val q = DocStreams.qualityScore(stream.toDS())
      .writeStream.format("memory").queryName("quality_scores")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(b1.toSeq)
    q.processAllAvailable()
    stream.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()

    def asTuples(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Float]("quality_prob"), r.getAs[Boolean]("keep"))).toSet
    val streamed = asTuples(spark.table("quality_scores").collect())
    val batch = asTuples(graft.operators.TextAnalysisQueries
      .t21QualityClassifier.fn(spark, d).collect())
    assert(streamed.size == docs.length)
    assert(streamed == batch,
      s"stream scores diverged from batch t21: " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }

  test("at-ingest decontamination across micro-batches equals batch d15") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ts = Timestamp.valueOf("2026-01-01 09:00:00")

    // the benchmark index, built once batch-side (d15's eval split) and
    // cached — the slowly-changing static side of the deployment
    val bench = graft.operators.DedupQueries.d15Sigs(
      graft.operators.DedupQueries.shingleArrays(spark, d))
      .filter($"doc_id" % 10 === 0).cache()
    try {
      // the training corpus arrives as a stream, split across batches
      val train = spark.read.parquet(s"$d/documents.parquet")
        .filter($"doc_id" % 10 =!= 0)
        .select($"doc_id", $"text").collect()
        .map(r => Doc(r.getLong(0), ts, r.getString(1)))
      val (b1, b2) = train.splitAt(train.length / 2)

      val flagged = scala.collection.mutable.Set[(Long, Long, Double)]()
      val stream = MemoryStream[Doc]
      val q = DocStreams.decontaminate(stream.toDS(), bench) { hits =>
        val rows = hits.collect().map(r =>
          (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id"),
            r.getAs[Double]("jaccard")))
        flagged.synchronized { flagged ++= rows }
      }
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()

      val batch = graft.operators.DedupQueries.d15CrossDecontamination
        .fn(spark, d).collect().map(r =>
          (r.getAs[Long]("train_id"), r.getAs[Long]("bench_id"),
            r.getAs[Double]("jaccard"))).toSet
      assert(batch.nonEmpty, "fixture must produce contaminated pairs")
      assert(flagged.toSet == batch,
        s"at-ingest screen diverged from batch d15: " +
          s"onlyStream=${(flagged.toSet -- batch).take(5)} " +
          s"onlyBatch=${(batch -- flagged).take(5)}")
    } finally bench.unpersist()
  }
}
