package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The configuration-only deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose the native
  * expressions as SQL functions (same codegen'd Catalyst nodes the
  * DataFrame API uses) and carry the TopKPerKey planner strategy.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions-spec")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("cosine_similarity is callable from pure SQL and matches the DataFrame API") {
    val sql = spark.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>)," +
        " CAST(array(3.0, 2.0, 1.0) AS ARRAY<FLOAT>)) AS cos").head().getDouble(0)
    import org.apache.spark.sql.functions.{array, lit}
    val api = spark.range(1).select(
      graft.functions.GraftFunctions.cosine_similarity(
        array(lit(1.0f), lit(2.0f), lit(3.0f)),
        array(lit(3.0f), lit(2.0f), lit(1.0f))).as("cos")).head().getDouble(0)
    assert(sql == api, s"SQL $sql != API $api")
    assert(math.abs(sql - 10.0 / 14.0) < 1e-12)
  }

  test("minhash_array is callable from pure SQL with literal parameters") {
    val row = spark.sql(
      "SELECT minhash_array(CAST(array(7, 12345, 99) AS ARRAY<BIGINT>)," +
        " 4, 42, 2038074743) AS sig").head().getSeq[Long](0)
    assert(row.length == 4)
    // same signature the expression API computes
    import org.apache.spark.sql.functions.{array, lit}
    val api = spark.range(1).select(
      graft.functions.MinHashArray.minhash_array(
        array(lit(7L), lit(12345L), lit(99L)), 4, 42L, 2038074743L).as("sig"))
      .head().getSeq[Long](0)
    assert(row == api)
  }

  test("count_min is callable from SQL as an aggregate and matches the API") {
    val sql = spark.sql(
      "SELECT count_min(h, 2, 8, 42, 2038074743) AS sk FROM " +
        "(SELECT CAST(id % 3 AS BIGINT) AS h FROM range(30))")
      .head().getSeq[Long](0)
    import org.apache.spark.sql.functions.{col, pmod}
    val api = spark.range(30)
      .select(pmod(col("id"), org.apache.spark.sql.functions.lit(3))
        .cast("long").as("h"))
      .select(graft.functions.CountMinAgg.count_min(
        col("h"), 2, 8, 42L, 2038074743L).as("sk"))
      .head().getSeq[Long](0)
    assert(sql.length == 16)
    assert(sql == api, s"SQL $sql != API $api")
    // every row of the sketch sums to the input count
    assert(sql.take(8).sum == 30 && sql.drop(8).sum == 30)
  }

  test("non-literal minhash parameters fail loudly, not silently") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_array(CAST(array(1) AS ARRAY<BIGINT>)," +
        " id + 1, 42, 7) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal"),
      s"expected a loud literal-parameter error, got: ${e.getMessage}")
  }

  test("hash60 is callable from pure SQL and matches the shared builder") {
    import org.apache.spark.sql.functions.col
    val sql = spark.sql("SELECT hash60(id) AS h FROM range(5)")
      .collect().map(_.getLong(0)).toSeq
    val api = spark.range(5)
      .select(graft.operators.TextAnalysisQueries.hash60(col("id")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(sql == api && sql.forall(_ >= 0L), s"SQL $sql != API $api")
    // the documented cross-engine definition: top 60 bits of md5
    val one = spark.sql(
      "SELECT hash60('x') = CAST(conv(substring(md5('x'), 1, 15), 16, 10)" +
        " AS BIGINT) AS ok").head().getBoolean(0)
    assert(one)
  }

  test("minhash_agg is callable from SQL as an aggregate and matches the API") {
    import org.apache.spark.sql.functions.col
    val sql = spark.sql(
      "SELECT minhash_agg(CAST(id AS BIGINT), 4, 42, 2038074743) AS sig " +
        "FROM range(100)").head().getSeq[Long](0)
    val api = spark.range(100)
      .select(graft.functions.MinHashAgg.minhash(
        col("id"), 4, 42L, 2038074743L).as("sig"))
      .head().getSeq[Long](0)
    assert(sql.length == 4 && sql == api, s"SQL $sql != API $api")
  }

  test("phash_bands is callable from SQL and matches the banding the mm07 gate uses") {
    import org.apache.spark.sql.functions.{col, explode, lit}
    // the mm07 two-word layout: lo/hi each hold 32 bits of the hash
    val lo = 0x12345678L
    val hi = 0x0FEDCBA9L
    val sql = spark.sql(
      s"SELECT explode(phash_bands(${lo}L, ${hi}L)) AS bucket")
      .select(col("bucket.band"), col("bucket.chunk"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val api = spark.range(1)
      .select(explode(graft.operators.MultimodalQueries.phashBandChunks(
        lit(lo), lit(hi))).as("bucket"))
      .select(col("bucket.band"), col("bucket.chunk"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(sql == api && sql.length == 5, s"SQL $sql != API $api")
    // 5-band (13/13/13/13/12-bit) reconstruction: the disjoint chunks
    // reassemble the two 32-bit words exactly (band 2 straddles them)
    val m = sql.toMap
    val rebuiltLo = m(0) | (m(1) << 13) | ((m(2) & 63L) << 26)
    val rebuiltHi = (m(2) >> 6) | (m(3) << 7) | (m(4) << 20)
    assert(rebuiltLo == lo && rebuiltHi == hi)
  }

  test("gif_frame_hashes is callable from SQL and matches the mm09 kernel") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Seq(1L, 42L, 255L)
    ids.map(id => (id, graft.operators.MultimodalQueries.syntheticGif(id)))
      .toDF("media_id", "payload")
      .createOrReplaceTempView("gif_media")
    val sql = spark.sql(
      """SELECT media_id, f.frame_no, f.n_frames, f.lo, f.hi
        |FROM gif_media
        |LATERAL VIEW explode(gif_frame_hashes(payload)) t AS f""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // the exact shared kernel the mm09 gate, the batch facade, and the
    // at-ingest stream screen all hash with
    val api = ids.flatMap(id =>
      graft.operators.MultimodalQueries.videoFrameHashesOf(
        graft.operators.MultimodalQueries.syntheticGif(id))
        .map { case (f, k, lo, hi) => (id, f, k, lo, hi) }).toSet
    assert(sql == api && sql.nonEmpty, s"SQL != kernel: $sql vs $api")
    // non-binary input fails analysis loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT gif_frame_hashes(42)").collect()
    }
  }

  test("the TopKPerKey strategy is injected at session build") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L))
      .toDF("k", "v")
    val top = graft.plans.TopK.perKey(df, Seq("k"),
      org.apache.spark.sql.functions.col("v"), 1, descending = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top == Set(("a", 3L), ("b", 9L)))
  }
}
