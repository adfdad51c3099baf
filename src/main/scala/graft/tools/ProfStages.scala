package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage timeline for a registered query: for each stage, wall
  * (submission→completion), task count, summed task run time, and the
  * GAPS between stages (driver-side planning / scheduling time the task
  * metrics never show). The per-query report answers "is this query
  * task-bound or driver-bound" — the round-20 optimization question.
  *
  * Usage: tools/run.sh graft.tools.ProfStages <repeats> <name>...
  */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val repeats = args(0).toInt
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror Bench's AQE env override so dumped plans/profiles match
      // what the bench actually executes under SPARK_GRAFT_AQE
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "2097152"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, sub: Long, done: Long,
      tasks: Int, taskMs: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = s.stageInfo
          stages.synchronized {
            stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
              i.submissionTime.getOrElse(0L),
              i.completionTime.getOrElse(0L), i.numTasks,
              i.taskMetrics.executorRunTime)
          }
        }
      })
    locally {
      import org.apache.spark.sql.functions._
      val d = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      d.groupBy("k").agg(sum("id"), count(lit(1))).count()
    }
    for (name <- names; r <- 1 to repeats) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a moment to drain
      Thread.sleep(300)
      val ss = stages.synchronized(stages.sortBy(_.sub).toVector)
      val stageWall = ss.map(s => s.done - s.sub).sum / 1000.0
      // union of [sub, done] intervals — wall actually covered by stages
      var covered = 0L; var cursor = 0L
      ss.foreach { s =>
        val a = math.max(s.sub, cursor)
        if (s.done > a) { covered += s.done - a }
        cursor = math.max(cursor, s.done)
      }
      val taskSec = ss.map(_.taskMs).sum / 1000.0
      println(f"[stages] $name%-26s r$r wall=$wall%6.2fs " +
        f"stages=${ss.length}%3d stageWallSum=$stageWall%6.2fs " +
        f"coveredWall=${covered / 1000.0}%6.2fs taskSum=$taskSec%7.2fs")
      if (r == repeats && sys.env.get("PROF_STAGES_DETAIL").contains("1")) {
        var prevDone = 0L
        ss.foreach { s =>
          val gap = if (prevDone == 0) 0 else s.sub - prevDone
          prevDone = math.max(prevDone, s.done)
          println(f"  stage ${s.id}%4d ${s.done - s.sub}%6dms gapBefore=" +
            f"$gap%5dms tasks=${s.tasks}%3d taskSum=${s.taskMs}%7dms " +
            s"${s.name}")
        }
      }
    }
    spark.stop()
  }
}
