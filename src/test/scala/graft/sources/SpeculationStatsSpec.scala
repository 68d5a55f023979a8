package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.Graft

/** The speculation guard on scoring-bearing observed metrics (ADVICE
  * r15): with `spark.speculation = true` a task that succeeds more
  * than once updates an `Observation`'s accumulators once per
  * successful attempt, so the BM25 corpus stats must NOT ride the
  * write's observe — they fall back to a disk- (save) or batch-
  * (append) backed aggregate. This suite runs a real
  * speculation-enabled session (its own context — the conf is
  * context-level) and proves the persisted stats still equal the
  * exact doclen truth through save → append → delete.
  */
class SpeculationStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-speculation-stats-spec")
    .config("spark.speculation", "true")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(): String =
    Files.createTempDirectory("graft-spec-stats").toString

  private def statsOf(d: String): (Long, Long) = {
    val r = spark.read.parquet(s"$d/stats").collect()(0)
    (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
  }

  private def truthOf(d: String): (Long, Long) = {
    val r = spark.read.parquet(s"$d/doclen")
      .agg(count(lit(1)), sum(col("dl"))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("speculation on: observes are distrusted and the persisted BM25 stats still equal the doclen truth across save/append") {
    assert(!IndexStore.observesExact(spark),
      "a spark.speculation=true session must not trust observes")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    val d = tmp()
    Graft.bm25Index(half1).save(d)
    assert(statsOf(d) == truthOf(d),
      "save under speculation must derive stats from the committed " +
        "table, not the observe")
    Graft.loadBm25Index(spark, d).appendDurable(d, half2)
    assert(statsOf(d) == truthOf(d),
      "append under speculation must fold the batch aggregate, not " +
        "the observe")
    // the ranking contract is unchanged: reopened equals live-built
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    assert(Graft.loadBm25Index(spark, d).searchText(q).collect().toSeq
      == Graft.bm25Index(docs).searchText(q).collect().toSeq)
  }
}
