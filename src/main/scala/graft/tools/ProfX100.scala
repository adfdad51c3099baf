package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: the x100 BETWEEN join with and without the
  * RangeJoinRewrite rule (not library surface).
  */
object ProfX100 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tol = 21600000000L
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("tsu").as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("tsu").as("click_ts"))
    def q() = clicks.join(errors,
        col("click_ts") >= col("err_ts") - tol &&
          col("click_ts") <= col("err_ts") + tol)
      .groupBy(pmod(col("err_id"), lit(16L)).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      val naive = q().collect().map(_.getLong(1)).sum
      println(f"rep $rep naive   ${(System.nanoTime() - t0) / 1e9}%6.2fs pairs=$naive")
      spark.experimental.extraOptimizations =
        Seq(graft.plans.RangeJoinRewrite(spark))
      spark.conf.set("spark.graft.rangeJoin.binSize", (2 * tol).toString)
      t0 = System.nanoTime()
      val rew = q().collect().map(_.getLong(1)).sum
      println(f"rep $rep rewrite ${(System.nanoTime() - t0) / 1e9}%6.2fs pairs=$rew")
      spark.conf.unset("spark.graft.rangeJoin.binSize")
      spark.experimental.extraOptimizations = Nil
      assert(naive == rew)
    }
    spark.stop()
  }
}
