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
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("text"))
      .withColumn("__doc", monotonically_increasing_id())
      .select(col("__doc"),
        posexplode(graft.functions.TextFunctions.tokens(lower(col("text"))))
          .as(Seq("__pos", "__w")))
    val vocab = toks.groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc).limit(4096)
      .select(col("__w"), lit(true).as("__v"))
    val marked = toks.join(broadcast(vocab), Seq("__w"), "left")
      .select(col("__doc"), col("__pos"), col("__w"), col("__v"))
    val bg = marked
      .withColumn("__w2", lead(col("__w"), 1)
        .over(Window.partitionBy("__doc").orderBy("__pos")))
      .withColumn("__v2", lead(col("__v"), 1)
        .over(Window.partitionBy("__doc").orderBy("__pos")))
      .filter(col("__v") && col("__v2") && col("__w") =!= col("__w2"))
      .select(col("__w").as("__a"), col("__w2").as("__b"))
    val edges = bg.select(col("__a").as("__src"), col("__b").as("__dst"))
      .unionAll(bg.select(col("__b").as("__src"), col("__a").as("__dst")))
      .groupBy("__src", "__dst").agg(count(lit(1)).as("__wt"))
      .persist()
    time("edge build + count") { edges.count() }
    val wdeg = edges.groupBy(col("__src")).agg(sum(col("__wt")).as("__deg"))
    val nodes = wdeg.select(col("__src").as("__n"))
    val n = time("nodes count") { nodes.count() }
    var pr = nodes.select(col("__n"), lit(1.0 / n).as("__pr"))
    for (i <- 1 to 3) {
      val contrib = edges
        .join(broadcast(wdeg), Seq("__src"))
        .join(broadcast(pr.select(col("__n").as("__src"), col("__pr"))),
          Seq("__src"))
        .select(col("__dst").as("__n"),
          (col("__wt").cast("double") / col("__deg").cast("double") *
            col("__pr")).as("__c"))
        .groupBy(col("__n")).agg(sum(col("__c")).as("__s"))
      pr = contrib.select(col("__n"),
        (lit(0.15 / n) + lit(0.85) * col("__s")).as("__pr"))
      val it = i
      time(s"iteration $it materialize") { pr.count() }
    }
    time("full textrank op") {
      graft.operators.TextRank.textrankKeywords(docs, "text").count()
    }
    edges.unpersist()
    spark.stop()
  }
}
