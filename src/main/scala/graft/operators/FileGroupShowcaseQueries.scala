package graft.operators

import java.nio.file.Files

import graft.prov._
import graft.prov.filegroup._
import graft.prov.filegroup.FileGroupOps._

/** Black-box workflow showcase through the driver contract (reference
  * entry point B, SURVEY §3.2): fileGroup → runScientificApplication →
  * inspect produced files. Self-contained (creates its own inputs +
  * stub script), and fully DETERMINISTIC: the inputs are fixed strings,
  * the script is `tr 'ACGT' 'TGCA'`, and every output column —
  * including the md5 of each produced file's CONTENT — is a constant,
  * so the oracle is the committed expectation itself (a VALUES table):
  * the gate hash-checks that the black-box run really produced those
  * bytes, not merely that four rows came back.
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
        g.files.map(f => (g.name, f.fileName, f.content.length.toLong,
          f.modified,
          java.security.MessageDigest.getInstance("MD5").digest(f.content)
            .map("%02x".format(_)).mkString)))
      sess.close()
      rows.toSeq
        .toDF("group_name", "file_name", "size", "modified", "content_md5")
        .orderBy("group_name", "file_name")
    },
    // the committed expectation: inputs verbatim, outputs = tr 'ACGT'
    // 'TGCA' over them (ACGTACGT→TGCATGCA, GGCCGGCC→CCGGCCGG, headers
    // untouched — lowercase/'>' are outside the tr set)
    Some("""SELECT * FROM (VALUES
           |  ('SAMPLE1', 'SAMPLE1.aln', CAST(12 AS BIGINT), true,
           |   'c5c36a0358b72601ac92228b838efbcc'),
           |  ('SAMPLE1', 'SAMPLE1.fasta', CAST(12 AS BIGINT), false,
           |   'c3952a05eb9b728be41d0f7576c41b2b'),
           |  ('SAMPLE2', 'SAMPLE2.aln', CAST(12 AS BIGINT), true,
           |   '9c1d76cd828e36fbbe2589ada8d44807'),
           |  ('SAMPLE2', 'SAMPLE2.fasta', CAST(12 AS BIGINT), false,
           |   '2d3b23cabe820f3042f2041ca43998c3'))
           |  t(group_name, file_name, size, modified, content_md5)
           |ORDER BY group_name, file_name""".stripMargin))

  def all: Seq[QueryDef] = Seq(fgBlackbox)
}
