package graft.prov.filegroup

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.prov._
import FileGroupOps._
import ContentAddressedStore._

class ContentAddressedStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("identical contents deduplicate; manifests round-trip; refs recorded") {
    val inputs = Files.createTempDirectory("cas-in")
    Files.writeString(inputs.resolve("a.txt"), "same content\n")
    Files.writeString(inputs.resolve("b.txt"), "same content\n") // dup bytes
    Files.writeString(inputs.resolve("c.txt"), "different\n")
    val storeDir = Files.createTempDirectory("cas-prov").toString
    val cas = new ContentAddressedStore(
      Files.createTempDirectory("cas-repo").toString)

    val s = ProvSession.create(spark, "cas", storeDir)
    val fg = fileGroup(s,
      FileGroupTemplate.ofFiles(
        Seq(inputs.resolve("a.txt").toString, inputs.resolve("b.txt").toString,
          inputs.resolve("c.txt").toString), "grp"))
      .persistFileGroupInStore(cas)
    s.close()

    // 3 files, 2 distinct contents → 2 objects
    assert(cas.objectCount == 2)
    val tree = cas.fileTree(s.executionId)
    assert(tree.length == 3 && tree.exists(_.endsWith("a.txt")))
    val elementId = spark.read.parquet(s"$storeDir/file_group_references")
      .select("element_id").head().getString(0)
    assert(new String(cas.readFile(s.executionId, elementId, "a.txt")) ==
      "same content\n")
    // idempotent re-write: object count unchanged
    cas.putObject("same content\n".getBytes)
    assert(cas.objectCount == 2)
    // FileGroupReference points at the manifest
    val folder = spark.read.parquet(s"$storeDir/file_group_references")
      .select("folder_path").head().getString(0)
    assert(folder.startsWith("manifests/"))
    // task flagged like the git path
    assert(spark.read.parquet(s"$storeDir/tasks")
      .filter(org.apache.spark.sql.functions.col("task_id") === fg.taskId)
      .head().getAs[Boolean]("has_data_in_repository"))
  }

  test("dropExecution + sweep reclaims unshared objects, keeps shared ones") {
    val inputs = Files.createTempDirectory("cas-ret-in")
    Files.writeString(inputs.resolve("shared.txt"), "shared bytes\n")
    Files.writeString(inputs.resolve("only1.txt"), "unique to exec 1\n")
    Files.writeString(inputs.resolve("only2.txt"), "unique to exec 2\n")
    val storeDir = Files.createTempDirectory("cas-ret-prov").toString
    val cas = new ContentAddressedStore(
      Files.createTempDirectory("cas-ret-repo").toString)

    val s1 = ProvSession.create(spark, "cas-old", storeDir)
    fileGroup(s1, FileGroupTemplate.ofFiles(
      Seq(inputs.resolve("shared.txt").toString,
        inputs.resolve("only1.txt").toString), "g1"))
      .persistFileGroupInStore(cas)
    s1.close()
    val s2 = ProvSession.create(spark, "cas-new", storeDir)
    fileGroup(s2, FileGroupTemplate.ofFiles(
      Seq(inputs.resolve("shared.txt").toString,
        inputs.resolve("only2.txt").toString), "g2"))
      .persistFileGroupInStore(cas)
    s2.close()
    assert(cas.objectCount == 3) // shared + only1 + only2

    new ProvenanceQueries(spark, storeDir)
      .dropExecution(s1.executionId, artifacts = Some(cas),
        sweepGraceMillis = 0L) // test is idle: reclaim regardless of age
    // s1's manifests and ITS unshared object are gone; the shared object
    // and everything of s2 survive the sweep
    assert(cas.fileTree(s1.executionId).isEmpty)
    assert(cas.objectCount == 2)
    val e2 = spark.read.parquet(s"$storeDir/file_group_references")
      .select("element_id").head().getString(0)
    assert(new String(cas.readFile(s2.executionId, e2, "shared.txt")) ==
      "shared bytes\n")
    assert(new String(cas.readFile(s2.executionId, e2, "only2.txt")) ==
      "unique to exec 2\n")
    // provenance tables: only s2 remains
    assert(spark.read.parquet(s"$storeDir/executions")
      .select("execution_id").collect().map(_.getString(0)).toSeq ==
      Seq(s2.executionId))
  }

  test("sweep concurrent with a writer never reclaims a mid-write object") {
    val cas = new ContentAddressedStore(
      Files.createTempDirectory("cas-sweep").toString)
    def fg(content: String) = FileGroup("g", Map.empty,
      Seq(FileElement("", "f.txt", modified = false, content.getBytes)))

    // deterministic mid-write window: the writer has put its object but
    // not yet its manifest — exactly the race the grace window closes
    val inFlight = cas.putObject("in-flight write\n".getBytes)
    // a genuinely dead orphan, aged past the window
    val dead = cas.putObject("long-dead orphan\n".getBytes)
    Files.setLastModifiedTime(
      java.nio.file.Paths.get(cas.rootDir, "objects", dead),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * ContentAddressedStore.DefaultSweepGraceMillis))

    assert(cas.sweepUnreferencedObjects() == 1L) // dead reclaimed, in-flight kept
    assert(Files.exists(
      java.nio.file.Paths.get(cas.rootDir, "objects", inFlight)))
    // the write completes; its object is referenced and readable
    cas.writeFileGroup("exec-w", "el-w", fg("in-flight write\n"))
    assert(new String(cas.readFile("exec-w", "el-w", "f.txt")) ==
      "in-flight write\n")

    // hammer: real writers racing sweeps; every committed manifest must
    // stay fully readable afterwards
    val writers = (1 to 4).map { w =>
      new Thread(() => (1 to 25).foreach { i =>
        cas.writeFileGroup(s"exec-$w", s"el-$i", fg(s"content $w/$i\n"))
      })
    }
    writers.foreach(_.start())
    (1 to 20).foreach(_ => cas.sweepUnreferencedObjects())
    writers.foreach(_.join())
    (1 to 4).foreach { w =>
      (1 to 25).foreach { i =>
        assert(new String(cas.readFile(s"exec-$w", s"el-$i", "f.txt")) ==
          s"content $w/$i\n")
      }
    }
  }

  test("concurrent writers of identical content stay idempotent") {
    val cas = new ContentAddressedStore(
      Files.createTempDirectory("cas-conc").toString)
    val content = "racy content".getBytes
    val threads = (1 to 8).map(_ => new Thread(() => {
      (1 to 50).foreach(_ => cas.putObject(content))
    }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(cas.objectCount == 1)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cas.rootDir, "objects",
        cas.putObject(content)))) == "racy content")
  }
}
