package graft.prov.javaapi

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.prov.ProvenanceQueries

/** Runs the pure-Java pipelines in `JavaApiUsage` (whose compilation by
  * javac is itself the Java-reachability proof) and asserts the results AND
  * the provenance the Java surface captured — wiring must be identical to
  * the Scala surface since every method delegates.
  */
class JavaApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("java-api-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newStore(): String =
    Files.createTempDirectory("javaprov").toString

  test("java word count: results + keyed-aggregation lineage") {
    val store = newStore()
    val counts = JavaApiUsage.wordCount(spark, store).asScala
    assert(counts == Map("to" -> 2L, "be" -> 2L, "or" -> 1L, "not" -> 1L,
      "that" -> 1L, "is" -> 1L))

    val q = new ProvenanceQueries(spark, store)
    val execId = q.executions.select("execution_id").collect().map(_.getString(0))
      .headOption.getOrElse(fail("no execution row"))
    val types = q.tasks(execId).select("transformation_type").collect()
      .map(_.getString(0)).toSet
    assert(Set("FLAT_MAP", "FILTER", "MAP", "REDUCE_BY_KEY").subsetOf(types))
    // "to" was reduced from two occurrences in two different lines:
    // its element must depend on 2 token elements
    val deps = q.elementDependencies(execId)
    val elems = q.elements(execId)
    val reduceTask = q.tasks(execId)
      .filter(org.apache.spark.sql.functions.col("transformation_type") === "REDUCE_BY_KEY")
      .select("task_id").head().getString(0)
    val toElem = elems
      .filter(org.apache.spark.sql.functions.col("task_id") === reduceTask)
      .filter(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("values"), 1) ===
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("to"),
          org.apache.spark.sql.functions.lit("2"))) // schema: Key, Value
      .select("element_id").collect()
    assert(toElem.length == 1, "one reduced element for key 'to'")
    val nDeps = deps
      .filter(org.apache.spark.sql.functions.col("target") === toElem.head.getString(0))
      .count()
    assert(nDeps == 2, s"'to' must depend on its 2 token elements, got $nDeps")
  }

  test("java joins, groupByKey, lookup") {
    val store = newStore()
    val r = JavaApiUsage.joinAndGroup(spark, store)
    // keys 1%2=1,3%2=1 join 11%2=1 (2 rows); 2,4 join 10 (2 rows)
    assert(r._1 == 4L)
    // 2 groups + lookup(1) = {1, 3} (2 values)
    assert(r._2 == 4L)
  }

  test("java custom provenance records: caller-chosen deps are persisted") {
    val store = newStore()
    val toks = JavaApiUsage.customProvenance(spark, store).asScala
    assert(toks.map(t => (t._1, t._2)) == Seq(("aa", 2L), ("bb", 2L), ("cc", 2L)))

    val q = new ProvenanceQueries(spark, store)
    val execId = q.executions.select("execution_id").collect().map(_.getString(0))
      .headOption.getOrElse(fail("no execution row"))
    import org.apache.spark.sql.functions.col
    val tokTask = q.tasks(execId)
      .filter(col("description") === "flatMapToPairWithProvRecordAndTask")
      .select("task_id").collect()
    assert(tokTask.length == 1, "the custom-record task node exists")
    val tokElems = q.elements(execId)
      .filter(col("task_id") === tokTask.head.getString(0))
    assert(tokElems.count() == 3, "aa, bb, cc")
    // every token element depends on exactly its source line element
    val deps = q.elementDependencies(execId)
      .join(tokElems.select(col("element_id").as("target")), "target")
    assert(deps.count() == 3)
    val sources = deps.select("source").distinct().count()
    assert(sources == 2, "two source lines")
  }

  test("java wide surface: outer joins, cogroup, keyed agg, sort, countByKey") {
    val store = newStore()
    val m = JavaApiUsage.wideSurface(spark, store).asScala
    // left keys {1:[1,3], 0:[2]}, right keys {1:[10], 0:[12]}
    assert(m("left") == 3L)          // (1,1,10) (1,3,10) (0,2,12)
    assert(m("right") == 3L)
    assert(m("full") == 3L)
    assert(m("cogroup") == 2L)
    assert(m("subtractByKey") == 0L)
    assert(m("agg") == 2L)           // 1 -> 4, 0 -> 2
    assert(m("mapValues") == 60L)    // (1+2+3)*10
    assert(m("sorted") == 2L)        // key 0 first -> value 2
    assert(m("countByKey") == 2L)
    assert(m("zip") == 2L)
  }

  test("java binaryRecords: fixed-length records readable from the Java mirror") {
    val store = java.nio.file.Files.createTempDirectory("javabin").toString
    val dir = java.nio.file.Files.createTempDirectory("javabindata")
    java.nio.file.Files.write(dir.resolve("a.bin"),
      Array.tabulate(12)(_.toByte)) // 3 records of 4
    assert(JavaApiUsage.binaryRecordCount(spark, store, dir.toString, 4) == 3L)
  }

  test("java record-level mapPartitions") {
    val store = newStore()
    assert(JavaApiUsage.recordSurface(spark, store) == 6L)
  }
}
