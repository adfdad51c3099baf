package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: group users by their first-activity period (the
  * cohort), then for each cohort count how many of its users were still
  * active 0, 1, 2, … periods later — the standard product-analytics
  * retention triangle, which is also the shape of crawl-freshness audits
  * ("of the domains first seen in week W, how many still yield documents
  * k weeks on").
  *
  * Period arithmetic is exact integer flooring of epoch microseconds into
  * `periodSeconds` buckets (no calendar functions), so the bucket edges
  * are engine-portable and the oracle replays them verbatim. `periods`
  * beyond the observed horizon simply have no rows — the output is the
  * sparse (cohort, offset) matrix, not a padded pivot; pivoting to columns
  * is a presentation step ([[Conform]] / stock `groupBy.pivot`).
  *
  * Scale shape: one user-keyed aggregation finds each user's first-period
  * (map-side combined min), then the events stream joins that tiny
  * (user → cohort) frame on the SAME user key — AQE reuses the
  * partitioning, so the events table shuffles ONCE — and the final
  * count-distinct-users per (cohort, offset) aggregates (cohort, offset,
  * user) triples that partial-dedup map-side. No window functions, no
  * per-user event buffering. At 100 TB of events: two exchanges, both on
  * keys, both combiner-backed.
  */
object Retention {

  /** Sparse retention matrix `(cohort_period, period_offset, n_active,
    * cohort_size, retention)`: `n_active` = distinct users of the cohort
    * active exactly `period_offset` periods after their first one;
    * `cohort_size` = the cohort's user count (= `n_active` at offset 0);
    * `retention` = the exact ratio. `cohort_period` is the epoch-second
    * floor of the period start.
    */
  def cohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts",
      periodSeconds: Long = 7L * 24 * 3600): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val p = periodSeconds * 1000000L
    // exact integer floor-division of epoch micros into periods: `/` on
    // longs is double division in Spark SQL (precision loss past 2^53),
    // so build IntegralDivide directly; it truncates toward zero, so
    // pre-epoch micros shift by p-1 to floor
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graftshim.ColumnBridge
    def intDiv(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(
        IntegralDivide(ColumnBridge.expression(a), Literal(p)))
    def periodOf(c: org.apache.spark.sql.Column) = {
      val m = unix_micros(c)
      when(m >= 0, intDiv(m)).otherwise(intDiv(m - lit(p - 1)))
    }
    val withPeriod = events
      .select(col(userCol).as("__u"), periodOf(col(tsCol)).as("__p"))
    val firstPeriod = withPeriod.groupBy(col("__u"))
      .agg(min(col("__p")).as("__p0"))
    val activity = withPeriod
      .join(firstPeriod, Seq("__u"))
      .select(col("__u"), col("__p0"),
        (col("__p") - col("__p0")).as("__off"))
    val cells = activity.groupBy(col("__p0"), col("__off"))
      .agg(countDistinct(col("__u")).as("n_active"))
    val sizes = firstPeriod.groupBy(col("__p0"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(sizes, Seq("__p0"))
      .select(
        (col("__p0") * lit(periodSeconds)).as("cohort_period"),
        col("__off").as("period_offset"),
        col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
  }
}
