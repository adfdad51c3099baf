package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-measure the soak gate's quiet-host probe reference with the SAME
  * estimators the artifacts record (r19 ADVICE: the r17-era
  * REF_CALIBRATION_SEC=0.55 was a single-sample measurement, while
  * artifacts now carry min-of-3 series points and min-of-2 per-run
  * probes that sit systematically lower — a silent mixed-estimator bias
  * toward stricter gating).
  *
  * Runs graft.Bench's exact fixed probe workload (50M-row hash +
  * shuffle agg at the bench thread count), warms until stable the same
  * way warmProbe does, then prints K min-of-3 series points and K
  * min-of-2 pairs plus their minima/medians, as one JSON line. Quote
  * the min-of-3 median into soak_gate.REF_CALIBRATION_SEC (tagged
  * "min3") on a quiet host only — check the raw samples are flat first.
  */
object ProbeRef {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val points = sys.env.getOrElse("SPARK_GRAFT_PROBE_POINTS", "7").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select((col("id") % 99991L).as("k"), xxhash64(col("id")).as("h"))
        .groupBy("k").agg(sum("h").as("s")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm like Bench.warmProbe: two consecutive stable pairs AND
    // proximity to the running minimum, capped at 10
    var prev = calibrate(); var minSeen = prev
    var stablePairs = 0; var tries = 1
    while (tries < 10 && stablePairs < 2) {
      val c = calibrate()
      val adjacent = c / math.max(prev, 1e-9) > 0.85 &&
        c / math.max(prev, 1e-9) < 1.15
      minSeen = math.min(minSeen, c)
      stablePairs =
        if (adjacent && c / math.max(minSeen, 1e-9) < 1.15) stablePairs + 1
        else 0
      prev = c; tries += 1
    }
    System.err.println(f"[proberef] warmup: $tries runs, last $prev%.3fs")
    val raw = Vector.fill(points * 3)(calibrate())
    val min3 = raw.grouped(3).map(_.min).toVector
    val min2 = raw.take(points * 2).grouped(2).map(_.min).toVector
    def med(v: Vector[Double]) = v.sorted.apply(v.length / 2)
    def js(v: Vector[Double]) =
      v.map(d => f"$d%.3f").mkString("[", ",", "]")
    println(
      s"""{"threads":$cpus,"raw":${js(raw)},"min3_points":${js(min3)},""" +
      s""""min2_points":${js(min2)},""" +
      f""""min3_median":${med(min3)}%.3f,"min3_min":${min3.min}%.3f,""" +
      f""""min2_median":${med(min2)}%.3f,"raw_median":${med(raw)}%.3f,""" +
      f""""raw_spread":${raw.max / raw.min}%.2f}""")
    spark.stop()
  }
}
