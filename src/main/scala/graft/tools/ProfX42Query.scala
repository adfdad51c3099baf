package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the exact x42 bench query (QueriesExt.incrementalDedup) with
  * per-phase stderr timing, bench-identical session config — isolates the
  * bench-harness gap from the library fold cost. Scratch tool, not library
  * surface.
  */
object ProfX42Query {
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
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[profq]   $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      // phase-instrumented copy of QueriesExt.incrementalDedup
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 999)
      val prefix = "x42_state"
      time("dropState(pre)")(Dedup.dropIncrementalDedupState(spark, prefix))
      val n = 999L
      val bounds = Seq((0L, n / 2), (n / 2, n))
      val survivorIds = bounds.flatMap { case (lo, hi) =>
        val surv = time(s"fold[$lo,$hi)")(Dedup.incrementalMinhashDedup(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          prefix, "text", "doc_id", threshold = 0.8, buckets = 4))
        val ids = time("collect ids")(
          surv.select(col("doc_id")).collect().map(_.getLong(0)))
        surv.unpersist()
        ids
      }
      time("dropState(post)")(Dedup.dropIncrementalDedupState(spark, prefix))
      System.err.println(
        f"[profq] run$r ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=${survivorIds.length}")
    }
  }
}
