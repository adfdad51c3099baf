package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B (not library surface): the x104 LEFT OUTER and x105 DATE
  * BETWEEN joins with and without the RangeJoinRewrite rule, for the
  * SCALE.md naive-vs-rewritten numbers.
  */
object ProfX104X105 {
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

    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
    val windows = ev
      .filter(col("event_type") === "purchase" &&
        pmod(col("event_id"), lit(5L)) === 0L)
      .select(col("event_id").as("win_id"), col("ts").as("wts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"))
    def x104() = clicks.join(windows,
        col("cts") >= col("wts") - expr("INTERVAL '20' MINUTE") &&
          col("cts") <= col("wts") + expr("INTERVAL '20' MINUTE"), "left")
      .agg(count(lit(1)).as("n"), count(col("win_id")).as("m"))

    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
    val mWin = spark.sql(
      """SELECT explode(sequence(DATE'1995-01-01', DATE'2001-08-01',
        |  interval 1 month)) AS ws""".stripMargin)
    def x105() = orders.join(mWin,
        col("od") >= col("ws") && col("od") <= date_add(col("ws"), 9))
      .agg(count(lit(1)).as("n"))

    // checksum over EVERY column, not just the total: a rewrite bug that
    // swaps a matched pair for a spurious null-extension keeps the row
    // count but flips the matched count
    def sumAll(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => (0 until r.length).map(i =>
        (i + 1) * r.getLong(i)).sum).sum
    def ab(label: String, q: () => org.apache.spark.sql.DataFrame,
        binSize: String): Unit = {
      var t0 = System.nanoTime()
      val naive = sumAll(q().collect())
      val tn = (System.nanoTime() - t0) / 1e9
      spark.experimental.extraOptimizations =
        Seq(graft.plans.RangeJoinRewrite(spark))
      spark.conf.set("spark.graft.rangeJoin.binSize", binSize)
      t0 = System.nanoTime()
      val rew = sumAll(q().collect())
      val tr = (System.nanoTime() - t0) / 1e9
      spark.conf.unset("spark.graft.rangeJoin.binSize")
      spark.experimental.extraOptimizations = Nil
      println(f"$label naive $tn%6.2fs rewrite $tr%6.2fs checksum=$naive")
      assert(naive == rew, s"$label mismatch: $naive vs $rew")
    }

    for (rep <- 1 to 3) {
      println(s"rep $rep:")
      ab("x104_leftouter", () => x104(), (40L * 60L * 1000000L).toString)
      ab("x105_date", () => x105(), "auto")
    }
    spark.stop()
  }
}
