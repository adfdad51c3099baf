package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the textrank path (not library surface). */
object ProfX75 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toksArr = docs.select(
      graft.functions.TextFunctions.tokens(lower(col("text"))).as("__t"))
    val vocab = toksArr.select(explode(col("__t")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc).limit(4096)
      .select(col("__w"))
    time("vocab build") { vocab.count() }
    val bg = toksArr
      .filter(size(col("__t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("__p"))
      .select(col("__p.0").as("__a"), col("__p.1").as("__b"))
      .filter(col("__a") =!= col("__b"))
    time("bigram explode only") { bg.count() }
    val filtered = bg
      .join(broadcast(vocab.select(col("__w").as("__a"))), Seq("__a"))
      .join(broadcast(vocab.select(col("__w").as("__b"))), Seq("__b"))
    val edges = filtered.select(explode(array(
        struct(col("__a").as("__src"), col("__b").as("__dst")),
        struct(col("__b").as("__src"), col("__a").as("__dst")))).as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
      .groupBy("__src", "__dst").agg(count(lit(1)).as("__wt"))
      .persist()
    time("edge build + count") { edges.count() }
    time("full textrank op") {
      graft.operators.TextRank.textrankKeywords(docs, "text").count()
    }
    time("full textrank op 2") {
      graft.operators.TextRank.textrankKeywords(docs, "text").count()
    }
    edges.unpersist()
    spark.stop()
  }
}
