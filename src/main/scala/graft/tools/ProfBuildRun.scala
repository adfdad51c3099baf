package graft.tools

import org.apache.spark.sql.SparkSession

/** Split a registered query's wall time into CONSTRUCTION (the builder
  * call — analysis, any eager work inside it) and EXECUTION (the count
  * action the bench times), with per-repeat numbers and job counts.
  *
  * Usage: tools/run.sh graft.tools.ProfBuildRun <repeats> <name>...
  */
object ProfBuildRun {
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
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    // warmup (match the bench)
    locally {
      import org.apache.spark.sql.functions._
      val d = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      d.groupBy("k").agg(sum("id"), count(lit(1))).count()
    }
    for (name <- names; r <- 1 to repeats) {
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val jBuild = jobs.get - j0
      df.count()
      val t2 = System.nanoTime()
      println(f"[prof] $name%-28s r$r build=${(t1 - t0) / 1e9}%6.2fs " +
        f"(jobs=$jBuild%3d) count=${(t2 - t1) / 1e9}%6.2fs " +
        f"(jobs=${jobs.get - j0 - jBuild}%3d)")
    }
    spark.stop()
  }
}
