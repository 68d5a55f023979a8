package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import MediaStreams.Media
import graft.api.Graft

/** At-ingest image dedup must equal the batch mm07 gate: streaming the
  * odd-id half of the corpus against an index of the even-id half, the
  * union of micro-batch screen outputs must be exactly the gated
  * query's near-dup pairs that cross the two halves — same decode,
  * same hash, same banding, same Hamming bound, by construction.
  */
class MediaStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("at-ingest image screen across micro-batches equals the batch mm07 cross-pairs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ts = Timestamp.valueOf("2026-01-01 09:00:00")

    // index: the EXISTING corpus = even media ids, hashed once
    // batch-side and cached (the slowly-changing static side)
    val index = graft.operators.MultimodalQueries.phashed(spark, d)
      .filter($"media_id" % 2 === 0).cache()
    try {
      // the stream: odd-id images arriving (payloads synthesized by the
      // same generator the gate decodes), split across two batches
      val arriving = spark.read.parquet(s"$d/documents.parquet")
        .select($"doc_id").as[Long].collect().filter(_ % 2 != 0)
        .map(id => Media(id, ts,
          graft.operators.MultimodalQueries.syntheticPng(id)))
      val (b1, b2) = arriving.splitAt(arriving.length / 2)

      val flagged = scala.collection.mutable.Set[(Long, Long, Long)]()
      val stream = MemoryStream[Media]
      val q = MediaStreams.imageDedupScreen(stream.toDS(), index) { hits =>
        val rows = hits.collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"), r.getAs[Long]("hamming")))
        flagged.synchronized { flagged ++= rows }
      }
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()

      // oracle: the GATED self-join's pairs that cross the halves,
      // reoriented to (arriving odd, indexed even)
      val gate = graft.operators.MultimodalQueries.mm07PerceptualHashDedup
        .fn(spark, d).collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"), r.getAs[Long]("hamming")))
      val expected = gate.collect {
        case (a, b, h) if a % 2 != 0 && b % 2 == 0 => (a, b, h)
        case (a, b, h) if a % 2 == 0 && b % 2 != 0 => (b, a, h)
      }.toSet
      assert(expected.nonEmpty, "fixture must produce cross-half pairs")
      assert(flagged.toSet == expected,
        s"at-ingest screen diverged from the batch gate: " +
          s"onlyStream=${(flagged.toSet -- expected).take(5)} " +
          s"onlyBatch=${(expected -- flagged).take(5)}")
    } finally index.unpersist()
  }

  test("at-ingest audio screen across micro-batches equals the batch mm08 cross-pairs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ts = Timestamp.valueOf("2026-01-01 09:00:00")

    val ids = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id").as[Long].collect()
    val index = graft.api.Graft.audioFingerprint(
        spark.createDataset(ids.filter(_ % 2 == 0).toSeq).map(id =>
          (id, graft.operators.MultimodalQueries.syntheticWav(id))))
      .cache()
    try {
      val arriving = ids.filter(_ % 2 != 0)
        .map(id => Media(id, ts,
          graft.operators.MultimodalQueries.syntheticWav(id)))
      val (b1, b2) = arriving.splitAt(arriving.length / 2)

      val flagged = scala.collection.mutable.Set[(Long, Long, Long)]()
      val stream = MemoryStream[Media]
      val q = MediaStreams.audioDedupScreen(stream.toDS(), index) { hits =>
        val rows = hits.collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"), r.getAs[Long]("hamming")))
        flagged.synchronized { flagged ++= rows }
      }
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()

      val gate = graft.operators.MultimodalQueries.mm08AudioFpDedup
        .fn(spark, d).collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"), r.getAs[Long]("hamming")))
      val expected = gate.collect {
        case (a, b, h) if a % 2 != 0 && b % 2 == 0 => (a, b, h)
        case (a, b, h) if a % 2 == 0 && b % 2 != 0 => (b, a, h)
      }.toSet
      assert(expected.nonEmpty, "fixture must produce cross-half pairs")
      assert(flagged.toSet == expected,
        s"at-ingest audio screen diverged from the batch gate: " +
          s"onlyStream=${(flagged.toSet -- expected).take(5)} " +
          s"onlyBatch=${(expected -- flagged).take(5)}")
    } finally index.unpersist()
  }

  test("at-ingest video screen across micro-batches equals the batch mm09 cross-pairs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ts = Timestamp.valueOf("2026-01-01 09:00:00")

    val ids = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id").as[Long].collect()
    val index = graft.api.Graft.videoFrameHashes(
        spark.createDataset(ids.filter(_ % 2 == 0).toSeq).map(id =>
          (id, graft.operators.MultimodalQueries.syntheticGif(id))))
      .cache()
    try {
      val arriving = ids.filter(_ % 2 != 0)
        .map(id => Media(id, ts,
          graft.operators.MultimodalQueries.syntheticGif(id)))
      val (b1, b2) = arriving.splitAt(arriving.length / 2)

      val flagged = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
      val stream = MemoryStream[Media]
      val q = MediaStreams.videoDedupScreen(stream.toDS(), index) { hits =>
        val rows = hits.collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"),
            r.getAs[Long]("n_aligned"), r.getAs[Long]("max_hamming")))
        flagged.synchronized { flagged ++= rows }
      }
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()

      // the aligned verify is symmetric in (ma, mb) — n_aligned and
      // max_hamming survive reorientation to (arriving odd, indexed even)
      val gate = graft.operators.MultimodalQueries.mm09VideoNearDup
        .fn(spark, d).collect().map(r =>
          (r.getAs[Long]("ma"), r.getAs[Long]("mb"),
            r.getAs[Long]("n_aligned"), r.getAs[Long]("max_hamming")))
      val expected = gate.collect {
        case (a, b, n, h) if a % 2 != 0 && b % 2 == 0 => (a, b, n, h)
        case (a, b, n, h) if a % 2 == 0 && b % 2 != 0 => (b, a, n, h)
      }.toSet
      assert(expected.nonEmpty, "fixture must produce cross-half pairs")
      assert(flagged.toSet == expected,
        s"at-ingest video screen diverged from the batch gate: " +
          s"onlyStream=${(flagged.toSet -- expected).take(5)} " +
          s"onlyBatch=${(expected -- flagged).take(5)}")
    } finally index.unpersist()
  }

  test("phashScreenStreamCurrent: a mid-stream publish flips the media screening generation, no restart, no mixed batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val ts = Timestamp.valueOf("2026-01-01 09:00:00")
    def tmp(): String = java.nio.file.Files
      .createTempDirectory("graft-phash-current").toString
    val root = tmp() + "/media-root"

    // two generations over the SAME stored hashes under DISJOINT id
    // ranges — a verdict's mb range proves which generation screened
    val storedHashes = graft.operators.MultimodalQueries
      .phashed(spark, d).filter($"media_id" % 2 === 0).cache()
    try {
      val b1 = tmp(); Graft.phashIndex(storedHashes).save(b1)
      assert(Graft.publishIndex(spark, root, b1) == 1)

      val arriving = spark.read.parquet(s"$d/documents.parquet")
        .select($"doc_id").as[Long].collect().filter(_ % 2 != 0)
        .map(id => Media(id, ts,
          graft.operators.MultimodalQueries.syntheticPng(id)))
      val stream = MemoryStream[Media]
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Set[(Long, Long, Long)])]
      val q = Graft.phashScreenStreamCurrent(root, stream.toDS()) {
        (gen, hits) =>
          got += ((gen, hits.collect().map(r => (r.getAs[Long]("ma"),
            r.getAs[Long]("mb"), r.getAs[Long]("hamming"))).toSet))
      }
      try {
        stream.addData(arriving.toSeq)
        q.processAllAvailable()
        assert(got.map(_._1).toSeq == Seq(1))
        assert(got(0)._2.nonEmpty && got(0)._2.forall(_._2 < 1000000L),
          "generation 1 must screen against the original ids only")
        // rebuild (same hashes, shifted ids) + publish mid-stream —
        // the very next batch screens against generation 2
        val b2 = tmp()
        Graft.phashIndex(storedHashes.withColumn("media_id",
          $"media_id" + 1000000L)).save(b2)
        assert(Graft.publishIndex(spark, root, b2) == 2)
        stream.addData(arriving.toSeq)
        q.processAllAvailable()
        assert(got.map(_._1).toSeq == Seq(1, 2))
        assert(got(1)._2.nonEmpty &&
          got(1)._2.forall(_._2 >= 1000000L),
          "generation 2 must screen against the shifted ids only — " +
            "no mixed batch")
        // same hashes ⇒ the verdict sets match modulo the id shift
        assert(got(1)._2.map(v => (v._1, v._2 - 1000000L, v._3))
          == got(0)._2)
      } finally q.stop()
    } finally storedHashes.unpersist()
  }
}
