package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The cross-process half of the incremental-dedup crash contract: the
  * in-JVM crash-injection specs ([[IncrementalStateCommitSpec]]) prove
  * the commit protocol within one session; THIS spec proves it across
  * real process death — a fold is killed hard (Runtime.halt at the
  * injection point: no shutdown hooks, kill -9 filesystem semantics)
  * mid-state-write in one JVM, and a brand-new process resumes against
  * a persistent derby metastore. The new process must: (1) be refused
  * by the dead application's writer token until the explicit operator
  * break; (2) sweep the torn appends and refold to exactly the
  * committed history + the batch; (3) on a second new process, skip a
  * tag-matched replay whole via the manifest-named loser verdict.
  *
  * Runs real `java` subprocesses (one Spark+Hive boot each), so it is
  * the slowest spec in the suite — but it is the only test of the
  * persistent-metastore deployment the protocol documents as required
  * for cross-process resume.
  */
class CrossProcessStateResumeSpec extends AnyFunSuite {

  private def addOpens: Seq[String] = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))

  /** Run one harness step in its own JVM; returns (exitCode, stdout). */
  private def runStep(step: String, workDir: String,
      prefix: String): (Int, String) = {
    val cmd = (Seq("java") ++ addOpens ++ Seq(
      "-Xmx4g",
      "-Dspark.ui.enabled=false",
      "-Dderby.stream.error.file=" + s"$workDir/derby_$step.log",
      "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
      "graft.tools.StateResumeHarness", step, workDir, prefix))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(new java.io.File(s"$workDir/stderr_$step.log"))
    val proc = pb.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
      .mkString
    val code = proc.waitFor()
    (code, out)
  }

  private def field(out: String, key: String): String =
    out.linesIterator.find(_.startsWith(s"$key:"))
      .getOrElse(fail(s"no $key line in harness output:\n$out"))
      .drop(key.length + 1).trim

  test("a fold killed hard mid-write resumes from a NEW process: writer " +
      "token refuses until broken, the refold matches the committed " +
      "history, and a second new process replay-skips on the tag") {
    val workDir = java.nio.file.Files
      .createTempDirectory("graft-xproc").toString
    val prefix = s"xproc_${System.nanoTime()}"
    try {
      val (c1, out1) = runStep("fold1", workDir, prefix)
      assert(c1 == 0, s"fold1 exited $c1:\n$out1")
      // batch1: doc 1 is an exact dup of 0, doc 2 a near-dup -> {0, 3}
      assert(field(out1, "SURVIVORS") == "0,3", out1)

      val (c2, _) = runStep("crashfold2", workDir, prefix)
      assert(c2 == 137, s"crashfold2 must die at the injection halt, got $c2")

      val (c3, out3) = runStep("resume", workDir, prefix)
      assert(c3 == 0, s"resume exited $c3:\n$out3")
      // the dead process's token must have refused the direct retry
      assert(field(out3, "REFUSED") == "true",
        "new process was not refused by the stranded writer token")
      // doc 10 dups history doc 0; 11 dups history doc 2 (one word
      // changed clears 0.6 Jaccard only with the pre-crash history
      // intact); 13 dups 12 in-batch -> {12}
      assert(field(out3, "SURVIVORS") == "12", out3)
      val bandRows = field(out3, "BANDROWS").toLong

      val (c4, out4) = runStep("replay", workDir, prefix)
      assert(c4 == 0, s"replay exited $c4:\n$out4")
      assert(field(out4, "SURVIVORS") == "12",
        "tag-matched cross-process replay diverged")
      assert(field(out4, "BANDROWS").toLong == bandRows,
        "replay appended state — the tag match did not skip the fold")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(workDir))
    }
  }

  test("a fold killed hard mid-write resumes from a NEW process WITHOUT " +
      "a manual lock break: the writer-lease takeover fires once the " +
      "dead holder misses its heartbeats, and the refold + tag replay " +
      "match the committed history") {
    val workDir = java.nio.file.Files
      .createTempDirectory("graft-xproc-lease").toString
    val prefix = s"xlease_${System.nanoTime()}"
    try {
      val (c1, out1) = runStep("fold1", workDir, prefix)
      assert(c1 == 0, s"fold1 exited $c1:\n$out1")
      assert(field(out1, "SURVIVORS") == "0,3", out1)

      val (c2, _) = runStep("crashfold2", workDir, prefix)
      assert(c2 == 137, s"crashfold2 must die at the injection halt, got $c2")

      // self-heal: no breakIncrementalDedupWriterLock anywhere — the
      // 1s-lease takeover must claim the dead JVM's stranded token alone
      val (c3, out3) = runStep("leaseresume", workDir, prefix)
      assert(c3 == 0, s"leaseresume exited $c3:\n$out3")
      assert(field(out3, "STRANDED") == "true",
        "dead process left no token — the step proved nothing")
      assert(field(out3, "SURVIVORS") == "12", out3)
      val bandRows = field(out3, "BANDROWS").toLong

      val (c4, out4) = runStep("replay", workDir, prefix)
      assert(c4 == 0, s"replay exited $c4:\n$out4")
      assert(field(out4, "SURVIVORS") == "12",
        "tag-matched replay diverged after a lease takeover")
      assert(field(out4, "BANDROWS").toLong == bandRows,
        "replay appended state — the tag match did not skip the fold")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(workDir))
    }
  }
}
