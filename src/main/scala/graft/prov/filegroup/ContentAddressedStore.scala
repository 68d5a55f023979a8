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
    } else {
      // dedup hit on an object possibly unreferenced and past the sweep
      // grace window: refresh its mtime so a concurrent sweep can't
      // reclaim it before this writer's manifest lands
      try Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { // swept between the exists check and the touch: re-put
        case _: java.nio.file.NoSuchFileException => return putObject(content)
      }
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
    // atomic write: a concurrent sweep must never read a half-written
    // manifest (it would miss references to past-grace shared objects)
    val tmp = Files.createTempFile(dir, ".tmp", "")
    Files.writeString(tmp, (s"name\t${group.name}" +: lines).mkString("\n"))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    s"manifests/$executionId/$elementId"
  }

  /** File tree of an execution (paths across all its manifests). */
  def fileTree(executionId: String): Seq[String] = {
    val dir = manifestsDir.resolve(executionId)
    if (!Files.exists(dir)) Seq.empty
    else listDir(dir).filterNot(_.getFileName.toString.startsWith(".tmp"))
      .flatMap { m =>
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
      listDir(dir).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dir)
    }
  }

  /** Delete objects no remaining manifest references; returns how many
    * were reclaimed. Mark-and-sweep over the manifest listing, made safe
    * against CONCURRENT writers by a grace window (the same protocol as
    * `git gc --prune=<date>`): a writer puts objects BEFORE its
    * manifest, so an unreferenced object younger than `graceMillis` may
    * be a write in flight and is never reclaimed — it either becomes
    * referenced when the manifest lands, or ages into the next sweep.
    * File locks can't carry this contract on the deployment target
    * (executors on NFS/fuse mounts); mtime-vs-wall-clock only needs the
    * grace to exceed put→manifest latency plus cross-node clock skew.
    * Stale `.tmp` files from crashed writers are reaped on the same
    * window. Pass 0 to reclaim regardless of age — only safe when
    * provably idle. Deletion is via deleteIfExists, so two sweeps
    * racing each other are also safe.
    */
  def sweepUnreferencedObjects(
      graceMillis: Long =
        ContentAddressedStore.DefaultSweepGraceMillis): Long = {
    val cutoff = System.currentTimeMillis() - graceMillis
    // a file can vanish between list and stat (a writer's atomic
    // tmp→object move, or a racing sweep); a vanished or unstatable
    // file is simply not ours to reclaim this round
    def mtimeOf(p: java.nio.file.Path): Long =
      try Files.getLastModifiedTime(p).toMillis
      catch { case _: java.io.IOException => Long.MaxValue }
    val referenced = listDir(manifestsDir).flatMap { ex =>
      listDir(ex).filterNot(_.getFileName.toString.startsWith(".tmp"))
        .flatMap { m =>
          // a manifest can vanish mid-scan (concurrent dropExecution) —
          // its references are then legitimately gone
          val text = try Some(Files.readString(m))
                     catch { case _: java.io.IOException => None }
          text.iterator.flatMap(_.linesIterator.drop(1)
            .map(_.split('\t')(1))).toSeq
        }
    }.toSet
    listDir(objectsDir)
      .filter(p => p.getFileName.toString.startsWith(".tmp"))
      .filter(p => mtimeOf(p) <= cutoff)
      .foreach(Files.deleteIfExists(_))
    listDir(objectsDir)
      .filter(p => !p.getFileName.toString.startsWith(".tmp"))
      .count { p =>
        val orphan = !referenced.contains(p.getFileName.toString) &&
          mtimeOf(p) <= cutoff
        if (orphan) Files.deleteIfExists(p)
        orphan
      }.toLong
  }
}

object ContentAddressedStore {
  /** Default sweep grace window: generous against put→manifest latency
    * (seconds) and cross-node clock skew (usually sub-second under NTP).
    */
  val DefaultSweepGraceMillis: Long = 10 * 60 * 1000L

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
