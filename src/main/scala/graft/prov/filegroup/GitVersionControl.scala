package graft.prov.filegroup

import java.nio.file.{Files, Paths}

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
  */
final class GitVersionControl(val repoDir: String) {

  private val gitBase = Seq("git", "-C", repoDir,
    "-c", "user.name=graft", "-c", "user.email=graft@localhost")

  locally {
    Files.createDirectories(Paths.get(repoDir))
    if (!Files.exists(Paths.get(repoDir, ".git"))) {
      run(Seq("git", "-C", repoDir, "init", "-q", "-b", "main"))
      run(gitBase ++ Seq("commit", "-q", "--allow-empty", "-m", "init"))
    }
  }

  private def branchOf(executionId: String) = s"exec_$executionId"

  /** Create the execution branch (reference: GitServerManager.scala:90-128). */
  def initExecution(executionId: String): Unit = synchronized {
    run(gitBase ++ Seq("checkout", "-q", "-B", branchOf(executionId), "main"))
  }

  /** Write + commit one FileGroup under `<taskDesc>/<elementId>/`;
    * returns the in-repo folder path (recorded as FileGroupReference —
    * reference: VersionControl.scala:99-118).
    */
  def writeFileGroup(executionId: String, taskDesc: String,
                     elementId: String, group: FileGroup): String = synchronized {
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
  def readFile(executionId: String, path: String): Array[Byte] = synchronized {
    val pb = new ProcessBuilder(
      (gitBase ++ Seq("show", s"${branchOf(executionId)}:$path")): _*)
    val proc = pb.start()
    val bytes = proc.getInputStream.readAllBytes()
    val code = proc.waitFor()
    require(code == 0, s"git show failed for $path")
    bytes
  }

  /** Final commit on execution end (reference: VersionControl.scala:134-157). */
  def finish(executionId: String): Unit = synchronized {
    run(gitBase ++ Seq("checkout", "-q", branchOf(executionId)))
    run(gitBase ++ Seq("add", "-A"))
    run(gitBase ++ Seq("commit", "-q", "--allow-empty", "-m",
      s"finish execution $executionId"))
  }

  def log(executionId: String): Seq[String] =
    run(gitBase ++ Seq("log", "--format=%s", branchOf(executionId)))
      .linesIterator.toSeq

  private def run(cmd: Seq[String]): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    require(code == 0, s"command failed ($code): ${cmd.mkString(" ")}\n$out")
    out
  }
}
