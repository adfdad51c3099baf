package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityFilter, Sampling, TextPipeline}

/** Scratch profiler for the corpus-funnel stages (not library surface). */
object ProfX43 {
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
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") < 20)
    val kept1 = time("1 quality") {
      val k = docs.join(QualityFilter(docs, "text",
        QualityFilter.Config(langs = Set.empty)).select("doc_id"),
        Seq("doc_id"), "left_semi").persist()
      k.count(); k
    }
    val kept2 = time("2 exact") {
      val k = Dedup.exact(kept1, "text", "doc_id").persist(); k.count(); k
    }
    val kept3 = time("3 neardup") {
      val k = Dedup.minhashDedup(kept2, "text", "doc_id", threshold = 0.8)
        .persist(); k.count(); k
    }
    val kept4 = time("4 decontam") {
      val k = kept3.join(TextPipeline.flagContaminated(kept3, bench,
        "text", "doc_id").filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"), "left_semi").persist(); k.count(); k
    }
    val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
    val kept5 = time("5 sample") {
      val k = Sampling.mixtureSample(kept4, "text", "doc_id", "source",
        weights, tokenBudget = 500L).persist(); k.count(); k
    }
    time("6 chunks") {
      TextPipeline.chunkByTokens(kept5, "text", "doc_id", 16, 4).count()
    }
    spark.stop()
  }
}
