package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window z-score anomaly detection over per-period event
  * counts — the metrics-ops staple ("is this hour's volume out of line
  * with the last day"), which is also a collection-pipeline health
  * signal (a crawler source going dark or bursting).
  *
  * Determinism contract: counts, trailing sums and sums-of-squares are
  * exact longs over an exact integer period floor; mean/variance/z are
  * derived per row by a FIXED formula (population variance
  * Σx²/n − mean², clamped at 0) whose only engine-variance is final-ulp
  * `sqrt`/division — absorbed by 6dp rounding (the x46 convention).
  * Warm-up rows (< `minTrailing` trailing periods) emit no score.
  *
  * Scale shape: one combiner-backed aggregation to per-(key, period)
  * counts, then ONE ordered window per key over the PERIOD series —
  * partition size is the number of periods (= time horizon / period),
  * not event volume, so a hot event type costs the same window work as
  * a cold one. The trailing frame is a RANGE frame on epoch seconds:
  * gaps (empty periods) widen the window correctly rather than sliding
  * a fixed row count over missing data.
  */
object Anomaly {

  /** Per-(typeCol, period) z-scores: `(typeCol, period_start, n,
    * trail_n, trail_mean, z)` where the trailing frame covers
    * `[period_start - trailingPeriods·period, period_start - period]`.
    * `z` is null when the trailing variance is 0 (constant series) or
    * the warm-up is unmet; `trail_mean` rounds at 6dp alongside it.
    */
  /** Per-(key, period-start-second) exact event counts — the shared
    * series-building front of [[hourlyZScores]] and [[ewmaSmooth]].
    * Exact period flooring: `/` on longs is double division in Spark
    * (Retention's IntegralDivide pattern); post-1970 timestamps assumed
    * (truncation == floor for nonnegative micros).
    */
  private def periodCounts(events: DataFrame, typeCol: String,
      tsCol: String, periodSeconds: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graftshim.ColumnBridge
    val pUs = periodSeconds * 1000000L
    val periodStart = (ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(unix_micros(col(tsCol))), Literal(pUs)))
      * lit(periodSeconds)).as("__p")
    events
      .select(col(typeCol).as("__k"), periodStart)
      .groupBy(col("__k"), col("__p"))
      .agg(count(lit(1)).as("__n"))
  }

  def hourlyZScores(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", periodSeconds: Long = 3600L,
      trailingPeriods: Int = 24, minTrailing: Int = 6): DataFrame = {
    require(periodSeconds > 0 && trailingPeriods >= minTrailing,
      "trailing window must cover the warm-up")
    val counts = periodCounts(events, typeCol, tsCol, periodSeconds)
    val w = Window.partitionBy(col("__k")).orderBy(col("__p"))
      .rangeBetween(-trailingPeriods.toLong * periodSeconds,
        -periodSeconds)
    val trailN = count(col("__n")).over(w)
    val trailSum = sum(col("__n")).over(w)
    val trailSq = sum(col("__n") * col("__n")).over(w)
    val withTrail = counts
      .withColumn("__tn", trailN)
      .withColumn("__ts", trailSum)
      .withColumn("__tq", trailSq)
    val mean = col("__ts").cast("double") / col("__tn").cast("double")
    val variance = greatest(
      col("__tq").cast("double") / col("__tn").cast("double") -
        mean * mean, lit(0.0))
    val z = when(col("__tn") >= minTrailing && variance > 0.0,
      round((col("__n").cast("double") - mean) / sqrt(variance), 6))
    withTrail.select(
      col("__k").as(typeCol),
      col("__p").as("period_start"),
      col("__n").as("n"),
      coalesce(col("__tn"), lit(0L)).as("trail_n"),
      when(col("__tn") >= minTrailing, round(mean, 6)).as("trail_mean"),
      z.as("z"))
  }

  /** Exponentially-weighted moving average of per-period event volumes —
    * the smoothing half of the metrics-ops pair ([[hourlyZScores]] is the
    * scoring half): `(typeCol, period_start, n, ewma)` with
    * `ewma_t = alpha·n_t + (1−alpha)·ewma_{t−1}`, seeded `ewma_0 = n_0`
    * (pandas `adjust=False`). Missing periods contribute nothing (the
    * recurrence steps per OBSERVED period) — gap-fill upstream with the
    * date-spine pattern (q47) if zero-filled smoothing is wanted.
    *
    * A running recurrence has no windowed-SQL form that survives long
    * horizons (the closed-form prefix trick needs `(1−alpha)^{-t}`, which
    * overflows past a few hundred periods), so the series — ONE element
    * per period, bounded by horizon/period exactly like the z-score
    * window and [[Sessionize.topPaths]]'s per-session buffers, never by
    * event volume — collapses per key and runs through the
    * [[graft.functions.expr.EwmaScanExpr]] O(periods) scan kernel.
    * Scale shape: one combiner-backed count aggregation, one key-wise
    * collect of the bounded period series, one projection. The
    * exchange-count is pinned in PlanQualitySpec.
    */
  def ewmaSmooth(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", periodSeconds: Long = 3600L,
      alpha: Double = 0.2): DataFrame = {
    require(periodSeconds > 0, "period must be positive")
    val counts = periodCounts(events, typeCol, tsCol, periodSeconds)
    val series = counts
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(struct(col("__p"), col("__n"))))
        .as("__s"))
      // aligned period/count/ewma arrays; the lambdas touch only their
      // own element (no computed-array capture — the x64 CollapseProject
      // trap applies to lambda BODIES referencing outer computed arrays)
      .withColumn("__ps", transform(col("__s"), e => e("__p")))
      .withColumn("__ns", transform(col("__s"), e => e("__n")))
      .withColumn("__xs", transform(col("__s"), e => e("__n").cast("double")))
    series
      .select(col("__k"),
        posexplode(arrays_zip(col("__ps"), col("__ns"),
          graft.functions.expr.SeriesExprs.ewmaScan(col("__xs"), alpha)
            .as("__es"))))
      .select(
        col("__k").as(typeCol),
        col("col")("__ps").as("period_start"),
        col("col")("__ns").as("n"),
        round(col("col")("__es"), 6).as("ewma"))
  }
}
