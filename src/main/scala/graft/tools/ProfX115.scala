package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfX115 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("docs=" + df.count())
    val t = 0.7
    val base = df.select(col("doc_id").as("__id"),
      array_distinct(graft.operators.Dedup.shingles(col("text"), 3)).as("__set"))
      .withColumn("__n", size(col("__set")))
    base.persist()
    println("avg set size=" + base.agg(avg("__n")).head())
    val freq = base.select(explode(col("__set")).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__f"))
    println("vocab=" + freq.count())
    println("top postings=" + freq.orderBy(desc("__f")).limit(5).collect().mkString(", "))
    val ordered = base.select(col("__id"), col("__n"), explode(col("__set")).as("__g"))
      .join(freq, "__g").groupBy("__id", "__n")
      .agg(sort_array(collect_list(struct(col("__f"), col("__g")))).as("__o"))
    val prefLen = (col("__n") - ceil(lit(t) * col("__n")) + 1).cast("int")
    val prefix = ordered.select(col("__id"), col("__n"),
      explode(slice(transform(col("__o"), s => s.getField("__g")), lit(1), prefLen)).as("__g"))
    prefix.persist()
    println("prefix rows=" + prefix.count())
    val pa = prefix.select(col("__id").as("id_a"), col("__n").as("__na"), col("__g"))
    val pb = prefix.select(col("__id").as("id_b"), col("__n").as("__nb"), col("__g"))
    val raw = pa.join(pb, Seq("__g")).where(col("id_a") < col("id_b"))
    println("raw shared-prefix pairs (with dup)=" + raw.count())
    val lenOk = raw.where(least(col("__na"), col("__nb")) >= ceil(lit(t) * greatest(col("__na"), col("__nb"))))
    println("after length filter=" + lenOk.count())
    println("distinct candidates=" + lenOk.select("id_a", "id_b").distinct().count())
    spark.stop()
  }
}
