package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch profiler for x32 components (not part of the library surface). */
object ProfX32 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }
    time("scan only") { docs.select(col("text")).count() }
    time("langid only") {
      docs.select(TextFunctions.langIdTrigram(col("text")).as("l"))
        .groupBy("l").count().count()
    }
    time("tokens+explode count") {
      docs.select(explode(TextFunctions.tokens(lower(col("text")))).as("t")).count()
    }
    time("explode+groupBy exact") {
      docs.select(explode(TextFunctions.tokens(lower(col("text")))).as("t"))
        .groupBy("t").count().count()
    }
    time("langid+explode") {
      docs.select(TextFunctions.langIdTrigram(col("text")).as("lang"),
        explode(TextFunctions.tokens(lower(col("text")))).as("token")).count()
    }
    val full = docs.select(TextFunctions.langIdTrigram(col("text")).as("lang"),
      explode(TextFunctions.tokens(lower(col("text")))).as("token"))
      .groupBy("lang")
      .agg(graft.functions.Aggregators.heavyHitters(col("token"), 16).as("hh"))
    time("full x32 shape") { full.count() }
    full.explain("formatted")
    spark.stop()
  }
}
