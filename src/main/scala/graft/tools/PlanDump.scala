package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: dump a registered query's executed plan (and kernel
  * expression / exchange occurrence counts) without sbt startup.
  *
  * Usage: tools/run.sh graft.tools.PlanDump <queryName> [sfDir] [full]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    Seq("icws_signature", "shingle_tf", "minhash_signature", "xxhash64",
      "ReusedExchange", "Exchange hashpartitioning", "BroadcastExchange",
      "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin", "Window")
      .foreach(k => println(f"$k%-28s ${k.r.findAllIn(p).length}"))
    if (args.contains("full")) println(p)
    spark.stop()
  }
}
