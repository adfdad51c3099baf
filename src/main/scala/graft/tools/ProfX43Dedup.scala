package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityFilter}

/** Scratch profiler: sub-steps of the funnel's near-dedup stage (not
  * library surface). Times candidate generation vs verify vs anti-join
  * on the funnel's own kept2 input.
  */
object ProfX43Dedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
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
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val kept1 = QualityFilter(docs, "text",
        QualityFilter.Config(langs = Set.empty))
        .select(docs.columns.map(col) :+ col("n_tokens"): _*).persist()
      val kept2 = Dedup.exact(kept1, "text", "doc_id").persist()
      timed("warm kept2")(kept2.count())
      val cands = timed("cand construct")(Dedup.minhashCandidates(kept2,
        "text", "doc_id", 3, 64, 16, 0.8).persist())
      timed("cand+verify run")(cands.count())
      val losers = cands.select(col("id_b").as("doc_id"))
      val kept3 = kept2.join(losers, Seq("doc_id"), "left_anti")
      timed("anti-join")(kept3.count())
      Seq(kept1, kept2, cands).foreach(_.unpersist())
    }
    spark.stop()
  }
}
