package graft.prov.filegroup

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.Encoders

import graft.prov._

/** Content-addressed artifact store — the cluster-scale alternative to
  * [[GitVersionControl]] (ARCHITECTURE.md decision 8): file contents live
  * once under `objects/<sha256>`, and each persisted FileGroup writes a
  * small manifest `manifests/<executionId>/<elementId>` listing
  * (path, sha, size, modified). Writes are idempotent and append-only, so
  * — unlike a git working tree — executors can persist concurrently with
  * no single-writer discipline; identical outputs across elements or
  * executions deduplicate to one object.
  *
  * REQUIREMENT: `rootDir` must be storage shared by the driver and every
  * executor (NFS, a fuse-mounted object store, or local disk in
  * local-mode) — writes happen inside executors
  * ([[ContentAddressedStore.CasOps.persistFileGroupInStore]]), reads on
  * the driver. On a cluster with only executor-local disks the manifests
  * would scatter invisibly; there is no write-time error to catch, so
  * this is a deployment contract, the same one any shared artifact
  * directory carries.
  */
final class ContentAddressedStore(val rootDir: String) extends Serializable {

  private def objectsDir = Paths.get(rootDir, "objects")
  private def manifestsDir = Paths.get(rootDir, "manifests")

  locally {
    Files.createDirectories(objectsDir)
    Files.createDirectories(manifestsDir)
  }

  private def sha256(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Files.list with the directory stream CLOSED — the bare iterator
    * leaks an OS directory handle until GC, which a long-lived driver
    * sweeping many executions would accumulate.
    */
  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector
    } finally s.close()
  }

  /** Store one file's content; returns its content hash. Idempotent —
    * an existing object is never rewritten (write-to-temp + atomic move
    * keeps concurrent writers safe).
    */
  def putObject(content: Array[Byte]): String = {
    val sha = sha256(content)
    val target = objectsDir.resolve(sha)
    if (!Files.exists(target)) {
      // executors deserialize this store without running the constructor;
      // re-create lazily so the first write on a fresh node succeeds
      Files.createDirectories(objectsDir)
      val tmp = Files.createTempFile(objectsDir, ".tmp", "")
      Files.write(tmp, content)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
    }
    sha
  }

  /** Persist a FileGroup: objects + one manifest; returns the manifest's
    * repo-relative path (recorded as the FileGroupReference folder).
    */
  def writeFileGroup(executionId: String, elementId: String,
                     group: FileGroup): String = {
    val lines = group.files.map { f =>
      val sha = putObject(f.content)
      s"${f.relativePath}\t$sha\t${f.content.length}\t${f.modified}"
    }
    val dir = manifestsDir.resolve(executionId)
    Files.createDirectories(dir)
    val manifest = dir.resolve(elementId)
    Files.writeString(manifest,
      (s"name\t${group.name}" +: lines).mkString("\n"))
    s"manifests/$executionId/$elementId"
  }

  /** File tree of an execution (paths across all its manifests). */
  def fileTree(executionId: String): Seq[String] = {
    val dir = manifestsDir.resolve(executionId)
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir).flatMap { m =>
      Files.readString(m).linesIterator.drop(1)
        .map(l => s"${m.getFileName}/${l.split('\t')(0)}").toSeq
    }.sorted
  }

  /** Read one file of one element back out of the store. */
  def readFile(executionId: String, elementId: String, path: String): Array[Byte] = {
    val manifest = manifestsDir.resolve(executionId).resolve(elementId)
    val line = Files.readString(manifest).linesIterator.drop(1)
      .find(_.split('\t')(0) == path)
      .getOrElse(throw new NoSuchElementException(s"$path not in manifest"))
    Files.readAllBytes(objectsDir.resolve(line.split('\t')(1)))
  }

  def objectCount: Long =
    listDir(objectsDir).count(p =>
      !p.getFileName.toString.startsWith(".tmp")).toLong

  /** Retention: remove one execution's manifests. Objects are left in
    * place — they may be shared with other executions (that sharing is
    * the point of content addressing); reclaim them afterwards with
    * [[sweepUnreferencedObjects]].
    */
  def dropExecution(executionId: String): Unit = {
    val dir = manifestsDir.resolve(executionId)
    if (Files.exists(dir)) {
      listDir(dir).foreach(Files.delete(_))
      Files.delete(dir)
    }
  }

  /** Delete objects no remaining manifest references; returns how many
    * were reclaimed. Mark-and-sweep over the manifest listing — safe to
    * run any time there are no CONCURRENT writers (a writer puts objects
    * before its manifest, so a sweep racing it could reclaim
    * just-written objects; retention is an idle-time operation).
    */
  def sweepUnreferencedObjects(): Long = {
    val referenced = listDir(manifestsDir).flatMap { ex =>
      listDir(ex).flatMap { m =>
        Files.readString(m).linesIterator.drop(1)
          .map(_.split('\t')(1)).toSeq
      }
    }.toSet
    listDir(objectsDir)
      .filter(p => !p.getFileName.toString.startsWith(".tmp"))
      .count { p =>
        val orphan = !referenced.contains(p.getFileName.toString)
        if (orphan) Files.delete(p)
        orphan
      }.toLong
  }
}

object ContentAddressedStore {
  /** Persist each FileGroup of a tracked dataset — runs INSIDE executors
    * via foreachWithDataElement (idempotent object writes need no
    * coordination), then records FileGroupReference rows on the driver.
    */
  implicit final class CasOps(private val self: ProvDataset[FileGroup]) {
    def persistFileGroupInStore(store: ContentAddressedStore): ProvDataset[FileGroup] = {
      val sess = self.session
      val execId = sess.executionId
      sess.flush() // same action semantics as foreachWithDataElement
      // Writes run inside executors against the shared store (object
      // writes are idempotent, manifests are per-element — no
      // coordination needed); only (elementId, manifestPath) pairs come
      // back to the driver, never file contents.
      val refs = self.ds.mapPartitions { it =>
        it.map(r => (r.id, store.writeFileGroup(execId, r.id, r.value)))
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING)).collect()
      refs.foreach { case (id, folder) => sess.addFileGroupRef(id, folder) }
      sess.taskById(self.taskId).foreach(_.hasDataInRepository = true)
      self
    }
  }
}
