package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc debug runner: times one named query and prints its physical plan. */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.get("DEBUG_EXPLAIN").contains("1")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val cold = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val warm = (System.nanoTime() - t1) / 1e9
    println(f"$name: $n rows, cold $cold%.1fs, warm $warm%.1fs")
    spark.stop()
  }
}
