package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the weighted-minhash path (not library surface). */
object ProfX27 {
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
    time("shingleTf only") {
      docs.select(Dedup.shingleTf(col("text"), 3).as("tf")).count()
    }
    time("tf+icws64") {
      docs.select(Dedup.shingleTf(col("text"), 3).as("tf"))
        .select(Dedup.icwsSignature(col("tf.hashes"), col("tf.weights"), 64)
          .as("sig")).count()
    }
    time("unweighted sh+sig64") {
      docs.select(Dedup.shingleHashes(col("text"), 3).as("sh"))
        .select(graft.operators.Dedup.minhashSignature(col("sh"), 64).as("sig"))
        .count()
    }
    time("x27 full") {
      Dedup.weightedMinhashCandidates(docs, "text", "doc_id").count()
    }
    time("x03 full") {
      Dedup.minhashCandidates(docs, "text", "doc_id").count()
    }
    println("=== x27 plan ===")
    println(Dedup.weightedMinhashCandidates(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString.take(6000))
    println("=== x03 plan ===")
    println(Dedup.minhashCandidates(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
