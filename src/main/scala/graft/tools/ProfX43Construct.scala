package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, QualityFilter}

/** Scratch profiler: driver-side cost anatomy of the funnel's stage-3
  * CONSTRUCTION (no action) — DataFrame build vs analysis vs optimization
  * vs persist registration. Explains the ~0.4s "3_construct" line in
  * [[ProfX43Stages]].
  */
object ProfX43Construct {
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
      kept2.count()
      val kept3 = timed("build (lazy)")(
        Dedup.minhashDedup(kept2, "text", "doc_id", threshold = 0.8))
      timed("analyze")(kept3.queryExecution.analyzed)
      timed("optimize")(kept3.queryExecution.optimizedPlan)
      timed("physical")(kept3.queryExecution.executedPlan)
      timed("persist reg")(kept3.persist())
      timed("run (count)")(kept3.count())
      Seq(kept1, kept2, kept3).foreach(_.unpersist())
    }
    spark.stop()
  }
}
