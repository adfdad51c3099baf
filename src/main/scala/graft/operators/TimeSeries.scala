package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling over event streams — OHLC ("candlestick")
  * bars: per (key, period) the opening/closing/extreme values of a
  * numeric column, the staple downsampling for metrics dashboards and
  * market-data pipelines.
  *
  * Determinism contract: open/close pick the first/last row by the
  * TOTAL order `(tsCol, idCol)` via `min_by`/`max_by` over a struct key
  * — timestamp ties cannot make the bar nondeterministic. Counts and
  * min/max are exact; `vsum` sums in decimal(38,6) so the total is
  * exact (and ANSI-overflow-free) regardless of aggregation order, then
  * surfaces as a double.
  *
  * Scale shape: ONE combiner-backed hash aggregation keyed on
  * (key, period) — min_by/max_by/min/max/count/sum all reduce map-side,
  * so the shuffle carries one partial bar per (key, period, task), never
  * event volume. No window functions anywhere (the oracle uses them;
  * the engine does not need to).
  */
object TimeSeries {

  /** `(typeCol, period_start, open, high, low, close, n, vsum)` per
    * period of `periodSeconds`; exact IntegralDivide flooring (the
    * Retention/Anomaly convention — `/` on longs is double division).
    */
  def ohlcBars(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", periodSeconds: Long = 3600L): DataFrame = {
    require(periodSeconds > 0, "period must be positive")
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graftshim.ColumnBridge
    val pUs = periodSeconds * 1000000L
    val periodStart = (ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(unix_micros(col(tsCol))), Literal(pUs)))
      * lit(periodSeconds)).as("__p")
    val key = struct(col(tsCol), col(idCol))
    events
      .select(col(typeCol).as("__k"), periodStart, key.as("__o"),
        col(valueCol).as("__v"))
      .groupBy(col("__k"), col("__p"))
      .agg(
        min_by(col("__v"), col("__o")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), col("__o")).as("close"),
        count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(38,6)")).cast("double").as("vsum"))
      .select(col("__k").as(typeCol), col("__p").as("period_start"),
        col("open"), col("high"), col("low"), col("close"), col("n"),
        col("vsum"))
  }
}
