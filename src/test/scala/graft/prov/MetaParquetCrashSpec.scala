package graft.prov

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The round-16 prov-audit fix pinned: [[MetaParquet]]'s in-progress
  * temp must be HIDDEN from readers (dot-prefixed — Spark's file index
  * and DuckDB's `*.parquet` glob skip `.`/`_`-PREFIXED names only), so
  * a crash mid-close can never leave a torn, reader-visible parquet
  * file in a meta table. The pre-fix `part-…parquet.inprogress` SUFFIX
  * naming was exactly that torn visible file — demonstrated below.
  */
class MetaParquetCrashSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import MetaParquet._

  private val fields = Seq("app_name" -> (FString: FT))

  private def writeRow(dir: String, v: String): Unit =
    append(spark.sparkContext.hadoopConfiguration, dir,
      fields, Seq(Seq(v)))

  test("a crashed append's dot-prefixed temp is invisible to readers and swept by the next append") {
    val root = Files.createTempDirectory("metaparquet").toString
    val dir = s"$root/executions/execution_id=e1"
    writeRow(dir, "app-a")
    // plant the crash artifact: a torn (non-parquet bytes) temp under
    // the FIXED naming scheme — hidden while staging
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, ".part-meta-crashed.parquet.inprogress"),
      "torn-mid-close".getBytes("UTF-8"))
    // readers never see it (dot-prefix = hidden to the file index)
    assert(spark.read.parquet(s"$root/executions")
      .select("app_name").collect().map(_.getString(0)).toSeq
      == Seq("app-a"))
    // the next append to the same partition dir sweeps the debris
    writeRow(dir, "app-b")
    assert(!Files.exists(
      Paths.get(dir, ".part-meta-crashed.parquet.inprogress")))
    assert(spark.read.parquet(s"$root/executions")
      .select("app_name").collect().map(_.getString(0)).sorted.toSeq
      == Seq("app-a", "app-b"))
  }

  test("the pre-fix failure class: a torn VISIBLE-named temp breaks every later read of the table") {
    val root = Files.createTempDirectory("metaparquet2").toString
    val dir = s"$root/executions/execution_id=e1"
    writeRow(dir, "app-a")
    // the OLD naming: same bytes, but the name is neither dot- nor
    // underscore-prefixed — Spark lists it and fails on its footer
    Files.write(Paths.get(dir, "part-meta-crashed.parquet.inprogress"),
      "torn-mid-close".getBytes("UTF-8"))
    intercept[Exception] {
      spark.read.parquet(s"$root/executions").collect()
    }
  }
}
