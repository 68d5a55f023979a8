package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.EmbStreams.EmbQuery

/** Streaming vector-search serving must return EXACTLY what the batch
  * IVF search (gated e05) returns for the same query set: same probed
  * cells, same exact in-cell ranking, same rounded cosines — with the
  * queries arriving across micro-batches instead of as a column.
  */
class EmbStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("emb-streams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming IVF serving equals batch e05 search on the same queries") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"

    // index built once, batch-side (the e05-gated building blocks);
    // the corpus assignment is cached as a real serving index would be
    val (assigned, centroids) =
      graft.operators.SimilarityQueries.ivfIndex(spark, d)
    val cached = assigned.cache()
    try {
      val ts = Timestamp.valueOf("2026-01-01 09:00:00")
      val qvecs = spark.read.parquet(s"$d/embeddings.parquet")
        .filter($"vec_id" < 5).select("vec_id", "embedding").collect()
        .map(r => EmbQuery(r.getLong(0), ts, r.getSeq[Float](1)))
      assert(qvecs.length == 5)
      val (b1, b2) = qvecs.splitAt(2)

      val stream = MemoryStream[EmbQuery]
      val q = EmbStreams.ivfServe(stream.toDS(), cached, centroids)
        .writeStream.format("memory").queryName("ann_hits")
        .outputMode(OutputMode.Append())
        .start()
      stream.addData(b1.toSeq)
      q.processAllAvailable()
      stream.addData(b2.toSeq)
      q.processAllAvailable()
      q.stop()

      def asTuples(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
      val streamed = asTuples(spark.table("ann_hits").collect())
      val batch = asTuples(
        graft.operators.SimilarityQueries.e05AnnIvf.fn(spark, d).collect())
      assert(streamed.nonEmpty)
      assert(streamed == batch,
        s"serving diverged from batch e05: " +
          s"onlyStream=${(streamed -- batch).take(5)} " +
          s"onlyBatch=${(batch -- streamed).take(5)}")
    } finally cached.unpersist()
  }

  test("serving micro-batch plan broadcasts the query side; the corpus never shuffles for the join") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val (assigned, centroids) =
      graft.operators.SimilarityQueries.ivfIndex(spark, d)
    val cached = assigned.cache()
    try {
      val ts = Timestamp.valueOf("2026-01-01 09:00:00")
      val qvec = spark.read.parquet(s"$d/embeddings.parquet")
        .filter($"vec_id" === 0).select("vec_id", "embedding").collect()
        .map(r => EmbQuery(r.getLong(0), ts, r.getSeq[Float](1)))
      val stream = MemoryStream[EmbQuery]
      val q = EmbStreams.ivfServe(stream.toDS(), cached, centroids)
        .writeStream.format("memory").queryName("ann_plan_probe")
        .outputMode(OutputMode.Append())
        .start()
      stream.addData(qvec.toSeq)
      q.processAllAvailable()
      // the last micro-batch's physical plan: the serving claim is that
      // the tiny probe side broadcasts into the corpus scan — a
      // regression to a shuffled join would put an Exchange on the
      // static side and re-shuffle the corpus EVERY batch
      val plan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      q.stop()
      assert(plan.contains("BroadcastHashJoin"),
        s"probe-cell join must be a broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"the static corpus must never shuffle for the serving join:\n$plan")
    } finally cached.unpersist()
  }
}
