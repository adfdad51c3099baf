package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-14 sf1 soak follow-up: quantify the exact-vs-sketch quantile
  * profile gap on the ~6M-row sf1 lineitem (the soak measured
  * x109's exact form at 22 s / 14 GB peak heap / 5.3 s GC — the
  * value-map percentile holding millions of distinct doubles). This
  * harness times both forms on identical columns; its numbers are the
  * COVERAGE.md adjudication for the profileQuantiles sketch default.
  *
  * Usage: tools/run.sh graft.tools.ProfSf1Quantiles [sfDir]
  */
object ProfSf1Quantiles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // warm the scan once so both forms read cached OS pages
    li.count()
    time("exact quantileProfile (x109 form)") {
      graft.operators.Profile.quantileProfile(li, cols).collect()
    }
    time("approx profileQuantiles (default)") {
      graft.operators.Profile.profileQuantiles(li, cols).collect()
    }
    time("exact again (order control)") {
      graft.operators.Profile.quantileProfile(li, cols).collect()
    }
    time("approx again (order control)") {
      graft.operators.Profile.profileQuantiles(li, cols).collect()
    }
    spark.stop()
  }
}
