package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.HashNgramClassifier

/** Stage timer for x29: labeling vs fit vs scoring, with and without the
  * adaptive scan widening, to localize regressions.
  *
  * Usage: tools/run.sh graft.tools.ProfX29 [sfDir]
  */
object ProfX29 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    for (widen <- Seq(false, true); rep <- 1 to 2) {
      println(s"--- widen=$widen rep=$rep")
      val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      val docs = if (widen) raw.repartition(32) else raw
      val labeled = docs.select(col("doc_id"), col("text"),
        (TextFunctions.qualityScore(col("text")) >= 0.8).cast("double")
          .as("label"))
      time("label+count")(labeled.count())
      val model = time("fit") {
        HashNgramClassifier.fit(labeled, "text", "label",
          numBuckets = 1 << 12, wordNgrams = 2, epochs = 6, lr = 1.0,
          momentum = 0.5, adagrad = true, earlyStopTol = 0.02)
      }
      val qm = HashNgramClassifier.quantize(model)
      time("score agg") {
        labeled.select(col("label"),
          HashNgramClassifier.score(col("text"), model).as("__s"),
          HashNgramClassifier.scoreQuantized(col("text"), qm).as("__sq"))
          .agg(count(lit(1))).head()
      }
    }
    spark.stop()
  }
}
