package graft.prov.filegroup

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Git-versioned artifact store — parity with the reference's embedded
  * Gitblit + per-execution branches (versioncontrol/VersionControl.scala,
  * GitServerManager.scala). Re-scoped per SURVEY §7 M6: one shared
  * repository driven from the driver over the `git` CLI, one branch per
  * execution, one commit per produced FileGroup; the reference's
  * per-machine branch + server-side merge daemon
  * (GitMergeBranchService.scala:23-103) is dropped — at cluster scale a
  * content-addressed artifact store is the right substrate, and the
  * single-writer discipline here mirrors the reference's serialized
  * commit executor (VersionControl.scala:96-129).
  *
  * The working tree is shared mutable state (`checkout` switches it), so
  * every mutating section holds a REPO-level lock, not just a
  * per-instance monitor: a `.graft.lock` file lock serializes writers
  * across JVMs, and a JVM-wide monitor keyed by canonical repo path
  * serializes instances/threads within one JVM (same-JVM overlapping
  * `FileLock`s would throw rather than block). Two sessions sharing a
  * repoDir therefore interleave at commit granularity — each commit
  * lands on its own execution's branch with only its own files.
  */
final class GitVersionControl(val repoDir: String) {

  private val gitBase = Seq("git", "-C", repoDir,
    "-c", "user.name=graft", "-c", "user.email=graft@localhost")

  private val canonicalRepo =
    Paths.get(repoDir).toAbsolutePath.normalize.toString

  private def withRepoLock[T](body: => T): T = {
    val monitor = GitVersionControl.jvmLocks
      .computeIfAbsent(canonicalRepo, _ => new Object)
    monitor.synchronized {
      val ch = FileChannel.open(Paths.get(repoDir, ".graft.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lk = ch.lock() // blocks until any other JVM releases
        try body finally lk.release()
      } finally ch.close()
    }
  }

  locally {
    Files.createDirectories(Paths.get(repoDir))
    withRepoLock {
      if (!Files.exists(Paths.get(repoDir, ".git"))) {
        run(Seq("git", "-C", repoDir, "init", "-q", "-b", "main"))
        // committed on main so every exec branch inherits it and
        // `add -A` never stages the lock file
        Files.writeString(Paths.get(repoDir, ".gitignore"), ".graft.lock\n")
        run(gitBase ++ Seq("add", ".gitignore"))
        run(gitBase ++ Seq("commit", "-q", "-m", "init"))
      } else if (!Files.exists(Paths.get(repoDir, ".gitignore"))) {
        // pre-existing repo initialized before the lock file existed:
        // without this, `add -A` commits .graft.lock onto every branch
        Files.writeString(Paths.get(repoDir, ".gitignore"), ".graft.lock\n")
        run(gitBase ++ Seq("add", ".gitignore"))
        run(gitBase ++ Seq("commit", "-q", "-m", "ignore lock file"))
      }
    }
  }

  private def branchOf(executionId: String) = s"exec_$executionId"

  /** Create the execution branch (reference: GitServerManager.scala:90-128). */
  def initExecution(executionId: String): Unit = withRepoLock {
    run(gitBase ++ Seq("checkout", "-q", "-B", branchOf(executionId), "main"))
  }

  /** Write + commit one FileGroup under `<taskDesc>/<elementId>/`;
    * returns the in-repo folder path (recorded as FileGroupReference —
    * reference: VersionControl.scala:99-118).
    */
  def writeFileGroup(executionId: String, taskDesc: String,
                     elementId: String, group: FileGroup): String = withRepoLock {
    run(gitBase ++ Seq("checkout", "-q", branchOf(executionId)))
    val folder = s"$taskDesc/$elementId"
    val root = Paths.get(repoDir, folder)
    Files.createDirectories(root)
    group.files.foreach { f =>
      val p = root.resolve(f.relativePath)
      Files.createDirectories(p.getParent)
      Files.write(p, f.content)
    }
    run(gitBase ++ Seq("add", "-A"))
    run(gitBase ++ Seq("commit", "-q", "--allow-empty", "-m",
      s"FileGroup ${group.name} of task $taskDesc"))
    folder
  }

  /** File tree of an execution branch
    * (reference: DataElementAPICtrl.kt:235-277).
    */
  def fileTree(executionId: String): Seq[String] =
    run(gitBase ++ Seq("ls-tree", "-r", "--name-only", branchOf(executionId)))
      .linesIterator.toSeq

  /** Read one file's bytes at the branch head
    * (reference: DataElementAPICtrl.kt:279-314, JGit TreeWalk → blob).
    */
  def readFile(executionId: String, path: String): Array[Byte] = withRepoLock {
    val pb = new ProcessBuilder(
      (gitBase ++ Seq("show", s"${branchOf(executionId)}:$path")): _*)
    val proc = pb.start()
    val bytes = proc.getInputStream.readAllBytes()
    val code = proc.waitFor()
    require(code == 0, s"git show failed for $path")
    bytes
  }

  /** Final commit on execution end (reference: VersionControl.scala:134-157). */
  def finish(executionId: String): Unit = withRepoLock {
    run(gitBase ++ Seq("checkout", "-q", branchOf(executionId)))
    run(gitBase ++ Seq("add", "-A"))
    run(gitBase ++ Seq("commit", "-q", "--allow-empty", "-m",
      s"finish execution $executionId"))
  }

  def log(executionId: String): Seq[String] =
    run(gitBase ++ Seq("log", "--format=%s", branchOf(executionId)))
      .linesIterator.toSeq

  /** Retention: delete the execution's branch — the git-backed
    * counterpart of `ContentAddressedStore.dropExecution` (compose with
    * `ProvenanceQueries.dropExecution` for full-store retention). Blob
    * reclamation is git's own `gc` job (unreferenced objects age out of
    * the reflog); the branch and its tree become unreadable immediately.
    * No-op if the branch never existed.
    */
  def dropExecution(executionId: String): Unit = withRepoLock {
    run(gitBase ++ Seq("checkout", "-q", "main"))
    // probe existence explicitly rather than swallowing `branch -D`
    // failures: a real failure (repo lock, fs error, branch checked out
    // in a linked worktree) must surface, not read as "already dropped"
    val exists = GitVersionControl.exitCode(gitBase ++ Seq("show-ref",
      "--verify", "--quiet", s"refs/heads/${branchOf(executionId)}")) == 0
    if (exists) run(gitBase ++ Seq("branch", "-q", "-D", branchOf(executionId)))
  }

  private def run(cmd: Seq[String]): String = GitVersionControl.run(cmd)
}

object GitVersionControl {
  /** One monitor per canonical repo path, JVM-wide — see class doc. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def run(cmd: Seq[String]): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    require(code == 0, s"command failed ($code): ${cmd.mkString(" ")}\n$out")
    out
  }

  /** Exit code of a command whose nonzero exit is an ANSWER (e.g.
    * `git show-ref --verify`), not a failure.
    */
  private[filegroup] def exitCode(cmd: Seq[String]): Int = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    proc.getInputStream.readAllBytes()
    proc.waitFor()
  }
}
