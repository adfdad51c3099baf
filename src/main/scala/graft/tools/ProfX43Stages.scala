package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityFilter, Sampling, TextPipeline}

/** Scratch profiler: per-stage wall-clock of the x43 corpus funnel (not
  * library surface). Mirrors `QueriesExt.corpusFunnel` stage for stage so
  * a regression in the composed query can be attributed to one operator.
  */
object ProfX43Stages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (rep <- 1 to reps) {
      println(s"rep $rep:")
      val t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") < 20)
      val clean = timed("bench_set")(
        !(TextPipeline.contaminationHits(docs, bench, "text").get >= 1))
      val kept1 = QualityFilter(docs, "text",
        QualityFilter.Config(langs = Set.empty))
        .select(docs.columns.map(col) ++
          Seq(col("n_tokens"), clean.as("__clean")): _*).persist()
      timed("0_all count")(docs.count())
      timed("1_quality")(kept1.count())
      val kept2 = Dedup.exact(kept1, "text", "doc_id").persist()
      timed("2_exact")(kept2.count())
      val kept3 = timed("3_construct")(Dedup.minhashDedup(kept2, "text",
        "doc_id", threshold = 0.8).persist())
      timed("3_neardup")(kept3.count())
      val kept4 = kept3.filter(col("__clean"))
      timed("4_decontam")(kept4.count())
      val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
      val kept5 = timed("5_construct")(
        Sampling.mixtureSample(kept4, "text", "doc_id", "source",
          weights, tokenBudget = 500L,
          tokenCountCol = Some("n_tokens")).persist())
      timed("5_sample")(kept5.count())
      val chunks = TextPipeline.chunkByTokens(kept5, "text", "doc_id",
        chunkSize = 16, overlap = 4)
      timed("6_chunks")(chunks.count())
      timed("unpersist")(
        Seq(kept1, kept2, kept3, kept5).foreach(_.unpersist()))
      timed("toDF_collect") {
        import spark.implicits._
        Seq("a" -> 1L).toDF("stage", "n").orderBy("stage").count()
      }
      println(f"  TOTAL                  ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}
