package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run
  * sequentially per build.sbt `Test / parallelExecution := false`).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sfDir = "/root/testdata/sf0.001"
}
