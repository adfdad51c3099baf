package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Checkpoint lifecycle: [[QueriesExt.checkpointed]] data must be
  * reclaimed PER QUERY, not per session. The session builders set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, so the
  * ContextCleaner deletes each checkpoint's `rdd-*` directory once the
  * consuming frame is garbage-collected — without it, a long-lived
  * session accumulates pair-stream-sized files on cluster storage until
  * JVM restart (the round-14 operational caveat this spec closes).
  *
  * The law checked: run every checkpointing wrapper (x42/x115/x117/x124)
  * twice in one session; results stay identical, and after dropping the
  * frames and GC'ing, the checkpoint dir holds no more `rdd-*` entries
  * than after the first pass — non-growing, i.e. the second pass's data
  * (and eventually the first's) was reclaimed, not accumulated.
  */
class CheckpointHygieneSpec extends SparkSpec {

  private val wrappers = Seq("x42_incremental_dedup",
    "x115_prefix_filter_pairs", "x117_dedup_sweep",
    "x124_cross_prefix_pairs")

  private def rddDirs: Set[String] = {
    val root = spark.sparkContext.getCheckpointDir
    root.toSeq.flatMap { d =>
      val p = Paths.get(new java.net.URI(d).getPath)
      if (!Files.exists(p)) Nil
      else {
        // close the walk stream: this runs inside a 250 ms poll loop,
        // and each unclosed stream pins a directory fd until GC
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(q => Files.isDirectory(q) &&
            q.getFileName.toString.startsWith("rdd-"))
          .map(_.toString).toList
        finally walk.close()
      }
    }.toSet
  }

  // run one pass of all four wrappers inside a method so the consuming
  // frames go out of scope (GC-reachable references in the enclosing
  // test body would pin the checkpoints and make reclamation untestable)
  private def onePass(): Map[String, Long] =
    wrappers.map { name =>
      name -> SparkEntry.queries(name)(spark, sfDir).count()
    }.toMap

  private def awaitNonGrowing(budgetDirs: Int): Set[String] = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var dirs = rddDirs
    while (dirs.size > budgetDirs && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(250)
      dirs = rddDirs
    }
    dirs
  }

  test("x42/x115/x117/x124 twice in one session: results repeat and the " +
      "checkpoint dir is non-growing after GC (per-query reclamation)") {
    val first = onePass()
    assert(first.values.forall(_ > 0L), s"empty wrapper result: $first")
    val afterFirst = rddDirs
    assert(afterFirst.nonEmpty,
      "expected reliable checkpoint data after the first pass")
    val second = onePass()
    assert(second === first,
      "wrapper results changed between passes in one session")
    // both passes' frames are now unreachable; the cleaner must bring
    // the dir back to (at most) one pass's worth of rdd-* entries
    val settled = awaitNonGrowing(afterFirst.size)
    assert(settled.size <= afterFirst.size,
      s"checkpoint dir GREW across passes and never reclaimed: " +
        s"first=${afterFirst.size} settled=${settled.size}")
  }
}
