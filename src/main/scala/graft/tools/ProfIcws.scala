package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage timer for the ICWS path: TF-only vs TF+signature vs full query,
  * to show which kernel dominates x27/x28.
  *
  * Usage: tools/run.sh graft.tools.ProfIcws [sfDir]
  */
object ProfIcws {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs  (n=$n)")
    }
    val tf = docs.select(col("doc_id"),
      Dedup.shingleTf(col("text"), 3).as("__tf"))
    for (_ <- 1 to 3) {
      time("tokens only") {
        docs.select(graft.functions.TextFunctions.tokens(col("text"))
          .as("t")).agg(sum(size(col("t")))).head().getLong(0)
      }
      time("shingle_tf") {
        tf.agg(sum(size(col("__tf.hashes")))).head().getLong(0)
      }
      time("tf + icws signature") {
        tf.withColumn("__sig", Dedup.icwsSignature(col("__tf.hashes"),
          col("__tf.weights"), 64)).agg(sum(size(col("__sig"))))
          .head().getLong(0)
      }
    }
    spark.stop()
  }
}
