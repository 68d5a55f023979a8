package graft.prov.filegroup

import graft.prov.DataElementSchema

/** One in-memory file (reference: advancedpipe/FileElement.java:13-89).
  * Content is a plain byte array (Spark BinaryType) — the reference's
  * growable FileHeap (vfs/FileHeap.java, 498 LoC) is dropped; Tungsten
  * rows hold binary columns natively.
  */
final case class FileElement(
    filePath: String,
    fileName: String,
    modified: Boolean,
    content: Array[Byte]) {
  def relativePath: String =
    if (filePath.isEmpty) fileName else s"$filePath/$fileName"
}

/** A named set of files + metadata (reference: advancedpipe/FileGroup.java:20-125).
  * As a Dataset row: STRUCT<name, extraInfo MAP<STRING,STRING>,
  * files ARRAY<STRUCT<...>>> (SURVEY §1.1).
  */
final case class FileGroup(
    name: String,
    extraInfo: Map[String, String],
    files: Seq[FileElement]) {
  def file(name: String): Option[FileElement] = files.find(_.fileName == name)
}

/** Declarative loader spec (reference: advancedpipe/FileGroupTemplate.scala:17-84). */
final case class FileGroupTemplate(
    name: String,
    paths: Seq[String],
    extraInfo: Map[String, String])

object FileGroupTemplate {
  def ofFile(path: String, extraInfo: Map[String, String] = Map.empty,
             name: String = null): FileGroupTemplate = {
    val f = new java.io.File(path)
    FileGroupTemplate(Option(name).getOrElse(stripExt(f.getName)), Seq(path), extraInfo)
  }

  def ofFiles(paths: Seq[String], name: String,
              extraInfo: Map[String, String] = Map.empty): FileGroupTemplate =
    FileGroupTemplate(name, paths, extraInfo)

  def ofDirectory(dir: String, extraInfo: Map[String, String] = Map.empty,
                  name: String = null): FileGroupTemplate =
    ofDirectoryWithFilter(dir, _ => true, extraInfo, name)

  def ofDirectoryWithFilter(dir: String, filter: java.io.File => Boolean,
                            extraInfo: Map[String, String] = Map.empty,
                            name: String = null): FileGroupTemplate = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && filter(f)).map(_.getAbsolutePath).sorted
    FileGroupTemplate(Option(name).getOrElse(d.getName), files.toSeq, extraInfo)
  }

  private def stripExt(n: String): String = {
    val i = n.lastIndexOf('.')
    if (i > 0) n.substring(0, i) else n
  }
}

/** User hooks around a black-box run
  * (reference: advancedpipe/ExecutionPlanning.scala:8-21). All fields are
  * serializable functions — they execute inside executors.
  */
final case class ExecutionPlanning(
    onReadLine: String => Unit = _ => (),
    onReadErrorLine: String => Unit = _ => (),
    filterFilesForGeneratedRDD: FileElement => Boolean = _ => true,
    getExtrasInfoForGeneratedRDD: Option[FileGroup => Map[String, String]] = None)

/** Default FileGroup schema (reference: schema/DefaultFileGroupSchema.scala:15-27):
  * one provenance row per file — Name / Path / Size.
  */
class FileGroupSchema extends DataElementSchema[FileGroup] {
  def fieldNames: Seq[String] = Seq("Name", "Path", "Size")
  def project(g: FileGroup): Seq[Seq[String]] =
    g.files.map(f => Seq(g.name, f.relativePath, f.content.length.toString))
}
