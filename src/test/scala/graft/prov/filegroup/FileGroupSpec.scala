package graft.prov.filegroup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.prov._
import FileGroupOps._

/** SciPhy-shaped black-box workflow assertions (FIXTURES.md §3) with stub
  * shell scripts standing in for mafft/readseq/etc.
  */
class FileGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("filegroup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newStore(): String = Files.createTempDirectory("fgstore").toString

  private def writeScript(dir: java.nio.file.Path, name: String, body: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, s"#!/bin/sh\n$body\n")
    p.toFile.setExecutable(true)
    p.toString
  }

  private def mkInputs(): java.nio.file.Path = {
    val dir = Files.createTempDirectory("fginputs")
    Files.writeString(dir.resolve("ORTHOMCL1.fasta"), ">s1\nACGT\n")
    Files.writeString(dir.resolve("ORTHOMCL2.fasta"), ">s2\nGGCC\n")
    dir
  }

  test("fileGroup: one group per template, per-file lineage") {
    val dir = mkInputs()
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store)
    val fg = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString,
        Map("NAME" -> "ORTHOMCL1")),
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL2.fasta").toString,
        Map("NAME" -> "ORTHOMCL2")))
    val groups = fg.collect()
    assert(groups.map(_.name).sorted == Seq("ORTHOMCL1", "ORTHOMCL2"))
    assert(groups.forall(g => g.files.length == 1 && !g.files.head.modified))
    s.close()
    val els = spark.read.parquet(s"$store/data_elements")
      .filter(org.apache.spark.sql.functions.col("task_id") === fg.taskId)
      .collect()
    // 2 group elements (deps=1 file each) + 2 file elements (no deps)
    assert(els.length == 4)
    val (fileEls, groupEls) = els.partition(
      _.getAs[scala.collection.Seq[String]]("deps").isEmpty)
    assert(fileEls.length == 2 && groupEls.length == 2)
    assert(groupEls.flatMap(_.getAs[scala.collection.Seq[String]]("deps")).toSet ==
      fileEls.map(_.getAs[String]("element_id")).toSet)
  }

  test("fileGroup: same-named files from different directories stay distinct; directory paths expand") {
    val root = Files.createTempDirectory("fgdup")
    val (da, db) = (root.resolve("a"), root.resolve("b"))
    Files.createDirectories(da); Files.createDirectories(db)
    Files.writeString(da.resolve("x.txt"), "from-a")
    Files.writeString(db.resolve("x.txt"), "from-b")
    val store = newStore()
    val s = ProvSession.create(spark, "fgdup", store)
    // explicit files sharing a basename: relative paths keep the
    // disambiguating directory component
    val g = FileGroupOps.fileGroup(s, FileGroupTemplate.ofFiles(
      Seq(da.resolve("x.txt").toString, db.resolve("x.txt").toString), "dup"))
      .collect().head
    assert(g.files.map(_.relativePath).sorted == Seq("a/x.txt", "b/x.txt"))
    assert(g.files.map(f => new String(f.content)).sorted ==
      Seq("from-a", "from-b"))
    // a DIRECTORY template path expands to its files (driver-side)
    val g2 = FileGroupOps.fileGroup(s,
      FileGroupTemplate("adir", Seq(da.toString), Map.empty)).collect().head
    assert(g2.files.map(_.relativePath) == Seq("x.txt"))
    s.close()
  }

  test("runScientificApplication: templating, new files marked modified") {
    val dir = mkInputs()
    val scripts = Files.createTempDirectory("scripts")
    writeScript(scripts, "step1.cmd",
      """cat "$1.fasta" | tr 'ACGT' 'TGCA' > "$1.out1"""")
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store)
    val out = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString,
        Map("NAME" -> "ORTHOMCL1")))
      .runScientificApplication("step1.cmd {{NAME}}", scripts.toString)
    val g = out.collect().head
    assert(g.files.map(_.fileName).sorted == Seq("ORTHOMCL1.fasta", "ORTHOMCL1.out1"))
    val produced = g.file("ORTHOMCL1.out1").get
    assert(produced.modified)
    assert(new String(produced.content).contains("TGCA"))
    assert(!g.file("ORTHOMCL1.fasta").get.modified)
    // 1→1 lineage group→group
    s.close()
    val outEls = spark.read.parquet(s"$store/data_elements")
      .filter(org.apache.spark.sql.functions.col("task_id") === out.taskId)
      .collect()
    assert(outEls.length == 1 &&
      outEls.head.getAs[scala.collection.Seq[String]]("deps").length == 1)
  }

  test("runCommand: nonzero exit raises; ExecutionPlanning filter applies") {
    val dir = mkInputs()
    val scripts = Files.createTempDirectory("scripts")
    val fail = writeScript(scripts, "fail.cmd", "exit 3")
    val ok = writeScript(scripts, "ok.cmd", "echo x > generated.txt; echo keep > keep.me")
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store, captureEnabled = false)
    val base = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString))
    val ex = intercept[org.apache.spark.SparkException] {
      base.runCommand(Seq(fail)).collect()
    }
    assert(ex.getMessage.contains("exited with 3") ||
      Option(ex.getCause).exists(_.getMessage.contains("exited with 3")))
    val filtered = base.runCommand(Seq(ok),
      ExecutionPlanning(filterFilesForGeneratedRDD = _.fileName != "keep.me"))
      .collect().head
    assert(filtered.files.map(_.fileName).contains("generated.txt"))
    assert(!filtered.files.map(_.fileName).contains("keep.me"))
    s.close()
  }

  test("extraInfo hook replaces metadata of the produced group") {
    val dir = mkInputs()
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store, captureEnabled = false)
    val out = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString,
        Map("NAME" -> "ORTHOMCL1")))
      .runCommand(Seq("true"),
        ExecutionPlanning(getExtrasInfoForGeneratedRDD =
          Some(g => g.extraInfo + ("STEP" -> "done"))))
    assert(out.collect().head.extraInfo == Map("NAME" -> "ORTHOMCL1", "STEP" -> "done"))
    s.close()
  }

  test("saveFilesAt writes dir/<elementId>/<files>") {
    val dir = mkInputs()
    val outDir = Files.createTempDirectory("fgout")
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store, captureEnabled = false)
    fileGroup(s, FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString))
      .saveFilesAt(outDir.toString)
    s.close()
    val written = Files.list(outDir).iterator()
    assert(written.hasNext)
    val uuidDir = written.next()
    assert(Files.exists(uuidDir.resolve("ORTHOMCL1.fasta")))
  }

  test("git version control: branch per execution, commit per FileGroup, readable blobs") {
    val dir = mkInputs()
    val repo = Files.createTempDirectory("gitrepo").toString
    val vc = new GitVersionControl(repo)
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store, versionControl = Some(vc))
    val fg = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString),
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL2.fasta").toString))
      .setName("load_inputs")
      .persistFileGroupInGit(vc)
    s.close()
    // one commit per FileGroup + init branch history
    val commits = vc.log(s.executionId)
    assert(commits.count(_.startsWith("FileGroup")) == 2)
    val tree = vc.fileTree(s.executionId)
    assert(tree.exists(_.endsWith("ORTHOMCL1.fasta")))
    val blob = new String(vc.readFile(s.executionId,
      tree.find(_.endsWith("ORTHOMCL1.fasta")).get))
    assert(blob.contains("ACGT"))
    // FileGroupReference rows link elements to repo folders
    val refs = spark.read.parquet(s"$store/file_group_references")
      .filter(org.apache.spark.sql.functions.col("execution_id") === s.executionId)
      .collect()
    assert(refs.length == 2)
    assert(refs.forall(_.getAs[String]("folder_path").startsWith("load_inputs/")))
    // task flagged
    val taskRow = spark.read.parquet(s"$store/tasks")
      .filter(org.apache.spark.sql.functions.col("task_id") === fg.taskId)
      .collect().head
    assert(taskRow.getAs[Boolean]("has_data_in_repository"))
    // retention: dropping the execution's branch makes its tree
    // unreadable; a second drop is a no-op
    val s2 = ProvSession.create(spark, "fg2", store, versionControl = Some(vc))
    fileGroup(s2, FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString))
      .persistFileGroupInGit(vc)
    s2.close()
    vc.dropExecution(s2.executionId)
    assert(intercept[RuntimeException](vc.fileTree(s2.executionId)) != null)
    vc.dropExecution(s2.executionId) // idempotent
    // the first execution's branch is untouched
    assert(vc.fileTree(s.executionId).exists(_.endsWith("ORTHOMCL1.fasta")))

    // per-element file tree resolves through the FileGroupReference
    val q = new ProvenanceQueries(spark, store)
    val elId = refs.head.getAs[String]("element_id")
    val files = q.fileTreeOf(s.executionId, elId, vc.fileTree(s.executionId))
    assert(files.length == 1 && files.head.contains(elId))
    // task 1-hop neighborhood
    val detail = q.taskDetail(s.executionId, fg.taskId).collect()
    assert(detail.exists(_.getAs[String]("relation") == "self"))
  }

  test("sciphy-shaped chain: two black-box steps compose with lineage") {
    val dir = mkInputs()
    val scripts = Files.createTempDirectory("scripts")
    writeScript(scripts, "step1.cmd", """tr 'ACGT' 'TGCA' < "$1.fasta" > "$1.aln"""")
    writeScript(scripts, "step2.cmd", """wc -c < "$1.aln" > "$1.stats"""")
    val store = newStore()
    val s = ProvSession.create(spark, "fg", store)
    s.spark.conf.set("spark.graft.scriptDir", scripts.toString)
    val result = fileGroup(s,
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL1.fasta").toString,
        Map("NAME" -> "ORTHOMCL1")),
      FileGroupTemplate.ofFile(dir.resolve("ORTHOMCL2.fasta").toString,
        Map("NAME" -> "ORTHOMCL2")))
      .runScientificApplication("step1.cmd {{NAME}}")
      .runScientificApplication("step2.cmd {{NAME}}")
    val groups = result.collect()
    assert(groups.length == 2)
    assert(groups.forall(g =>
      g.files.exists(_.fileName.endsWith(".stats")) &&
      g.files.exists(_.fileName.endsWith(".aln"))))
    s.close()
    // lineage chain: stats group ← aln group ← input group (+2 file roots)
    val q = new ProvenanceQueries(spark, store)
    val finalEl = q.producedBy(s.executionId, result.taskId)
      .select("element_id").head().getString(0)
    assert(q.lineageOf(s.executionId, finalEl).count() >= 3)
  }
}
