package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // JVM (not ICU) case mappings for UTF8_BINARY lower/upper:
      // CollationAwareUTF8String's static init otherwise title-cases every
      // Unicode code point through ICU BreakIterators -- observed wedging a
      // whole executor for 400+ CPU-seconds on first non-ASCII lower()
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // reclaim each reliable checkpoint (QueriesExt.checkpointed) when its
      // consuming frame is GC'd -- context-creation conf, so it must sit in
      // every builder, not in the wrapper
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // iteration aid (same contract as Bench): SPARK_GRAFT_ONLY=regex dumps
    // the matching subset; the driver never sets it, so the gate is whole
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // write natural partitions: a final repartition(1) would shuffle and
        // destroy each query's ORDER BY row order, and coalesce(1) would
        // collapse the whole upstream plan into one task. Range-partitioned
        // sorted output lands as part-00000..N in global order, and readers
        // (pandas/duckdb/pyarrow) concatenate files in name order, so the
        // dumped row order matches the oracle's ORDER BY.
        fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
