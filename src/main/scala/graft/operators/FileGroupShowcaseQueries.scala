package graft.operators

import java.nio.file.Files

import graft.prov._
import graft.prov.filegroup._
import graft.prov.filegroup.FileGroupOps._

/** Black-box workflow showcase through the driver contract (reference
  * entry point B, SURVEY §3.2): fileGroup → runScientificApplication →
  * inspect produced files. Self-contained (creates its own inputs +
  * stub script); rows-only check.
  */
object FileGroupShowcaseQueries {

  val fgBlackbox = QueryDef(
    "fg_blackbox_pipeline",
    (s, _) => {
      val spark = s
      import spark.implicits._
      val inputs = Files.createTempDirectory("fgq-in")
      Files.writeString(inputs.resolve("SAMPLE1.fasta"), ">a\nACGTACGT\n")
      Files.writeString(inputs.resolve("SAMPLE2.fasta"), ">b\nGGCCGGCC\n")
      val scripts = Files.createTempDirectory("fgq-scripts")
      val script = scripts.resolve("align.cmd")
      Files.writeString(script,
        "#!/bin/sh\ntr 'ACGT' 'TGCA' < \"$1.fasta\" > \"$1.aln\"\n")
      script.toFile.setExecutable(true)

      val store = Files.createTempDirectory("fgq-store").toString
      val sess = ProvSession.create(s, "fg-showcase", store)
      val result = fileGroup(sess,
        FileGroupTemplate.ofFile(inputs.resolve("SAMPLE1.fasta").toString,
          Map("NAME" -> "SAMPLE1")),
        FileGroupTemplate.ofFile(inputs.resolve("SAMPLE2.fasta").toString,
          Map("NAME" -> "SAMPLE2")))
        .runScientificApplication("align.cmd {{NAME}}", scripts.toString)
      val rows = result.collect().flatMap(g =>
        g.files.map(f => (g.name, f.fileName, f.content.length.toLong, f.modified)))
      sess.close()
      rows.toSeq.toDF("group_name", "file_name", "size", "modified")
        .orderBy("group_name", "file_name")
    },
    None)

  def all: Seq[QueryDef] = Seq(fgBlackbox)
}
