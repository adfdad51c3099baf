package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * plan evidence the optimization rounds commit under plans/r<N>/.
  *
  * Usage: tools/run.sh graft.tools.ExplainDump <outDir> <suffix> <name>...
  * Writes <outDir>/<name>_<suffix>.txt per query. Runs under the same
  * session configuration as [[graft.Bench]] (shuffle partitions = cores,
  * AQE on, 2MB splits) so the dumped initial plan matches what the bench
  * executes.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
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
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // capture the formatted plan string (explain() prints to stdout)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[explain] wrote $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
