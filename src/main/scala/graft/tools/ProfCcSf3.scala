package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch profiler for x36's sf3 convergence (not library surface):
  * counts the exact-cosine pair graph's edges and replays the
  * distributed label-propagation loop pass by pass, logging how many
  * labels change — to see whether the graph genuinely has a deep
  * structure or the loop's reach grows slower than expected.
  */
object ProfCcSf3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfdata/sf3"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val t0 = System.nanoTime()
    val pairs = Similarity.exactCosinePairs(emb, 0.4)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .persist()
    val nEdges = pairs.count()
    System.err.println(f"[prof] edges=$nEdges%,d in ${(System.nanoTime() - t0) / 1e9}%.1fs")

    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    System.err.println(f"[prof] directed distinct edges=${edges.count()}%,d")
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    System.err.println(f"[prof] nodes=${labels.count()}%,d")

    def sever(df: org.apache.spark.sql.DataFrame) = {
      val out = spark.createDataFrame(df.rdd, df.schema).persist()
      out.count(); out
    }
    var i = 0
    var changed = -1L
    while (changed != 0L && i < 40) {
      val t1 = System.nanoTime()
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val stepped = sever(labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp")))
      val mapping = stepped
        .select(col("id").as("__did"), col("comp").as("__dc"))
      val next = stepped
        .join(mapping, col("comp") === col("__did"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__dc"), col("comp"))).as("comp"))
      changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("id"))
        .filter(col("comp") =!= col("old")).count()
      labels = next
      i += 1
      System.err.println(
        f"[prof] pass $i%2d changed=$changed%,d in ${(System.nanoTime() - t1) / 1e9}%.1fs")
    }
    val nComps = labels.select(col("comp")).distinct().count()
    System.err.println(f"[prof] converged after $i passes; components=$nComps%,d")
    spark.stop()
  }
}
