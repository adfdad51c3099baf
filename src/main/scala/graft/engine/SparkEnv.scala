package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's session bootstrap (`/root/reference/src/pipeline.py:12-18`)
  * but with scale-aware defaults the reference lacks:
  *
  *  - `spark.sql.shuffle.partitions` sized to the actual parallelism instead of
  *    Spark's default 200 (wrong for local mode, and on a real cluster the
  *    caller passes `cores = executors * coresPerExecutor`).
  *  - AQE on: runtime coalescing of small shuffle partitions + skew-join
  *    splitting, which is what makes a fixed partition count survive a 100x
  *    scale-up.
  *  - UTC session timezone so date/timestamp semantics match the DuckDB oracle.
  *  - ANSI off in `compatSession`: the reference relies on Spark 3 silent
  *    cast-to-null for dirty strings (`pipeline.py:78-83`); Spark 4 defaults
  *    ANSI on, which would error instead.
  */
object SparkEnv {

  /** Scale-aware session for engine workloads. */
  def session(
      appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Reference-compatibility session: identical to [[session]] plus ANSI off,
    * so string->numeric casts over dirty bronze data yield NULL (Spark 3.x
    * behavior the reference pipeline depends on) instead of throwing.
    */
  def compatSession(
      appName: String = "graft-compat",
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
