package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityFilter, Sampling, TextPipeline}

/** Scratch profiler for the corpus-funnel stages (not library surface).
  * Runs the shared-tokenization funnel shape and the re-tokenize-per-stage
  * shape alternately in ONE JVM (the host has multi-minute degraded
  * phases; cross-process comparisons are meaningless).
  */
object ProfX43 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def funnel(shareToks: Boolean): Double = {
      val t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val tc = if (shareToks) "__toks" else "text"
      val bench0 = docs.filter(col("doc_id") < 20)
      val bench = if (shareToks) bench0.withColumn("__toks",
        graft.functions.TextFunctions.tokens(col("text"))) else bench0
      val proj: Seq[org.apache.spark.sql.Column] =
        if (shareToks) docs.columns.toSeq.map(col) :+
          graft.functions.TextFunctions.tokens(col("text")).as("__toks")
        else docs.columns.toSeq.map(col)
      val kept1 = QualityFilter(docs, "text",
        QualityFilter.Config(langs = Set.empty)).select(proj: _*).persist()
      val kept2 = Dedup.exact(kept1, "text", "doc_id").persist()
      val kept3 = Dedup.minhashDedup(kept2, tc, "doc_id", threshold = 0.8)
        .persist()
      val kept4 = kept3.join(TextPipeline.flagContaminated(kept3, bench,
        tc, "doc_id").filter(!col("contaminated")).select("doc_id"),
        Seq("doc_id"), "left_semi").persist()
      val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
      val kept5 = Sampling.mixtureSample(kept4, tc, "doc_id", "source",
        weights, tokenBudget = 500L).persist()
      Seq(kept1, kept2, kept3, kept4, kept5).foreach(_.count())
      TextPipeline.chunkByTokens(kept5, tc, "doc_id", 16, 4).count()
      Seq(kept1, kept2, kept3, kept4, kept5).foreach(_.unpersist())
      (System.nanoTime() - t0) / 1e9
    }

    for (rep <- 1 to reps) {
      val tTok = funnel(shareToks = true)
      val tText = funnel(shareToks = false)
      println(f"rep $rep: shared-toks $tTok%6.2fs   per-stage $tText%6.2fs")
    }
    spark.stop()
  }
}
