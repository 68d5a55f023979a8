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
}
