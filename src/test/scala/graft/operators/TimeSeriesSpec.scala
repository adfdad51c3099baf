package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TimeSeries.ohlcBars]] — open/close total-order determinism, exact
  * extremes, decimal-exact sums, and the no-window plan shape.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(ms: Long, id: Long, v: Double, k: String = "m") =
    (id, new Timestamp(ms), k, v)

  test("bars carry first/last by (ts,id), exact high/low/n and the " +
      "decimal-summed volume") {
    val df = Seq(
      ev(1000L, 1L, 5.0), ev(2000L, 2L, 9.0), ev(3000L, 3L, 1.0),
      ev(3600_000L + 500L, 4L, 7.0) // second hour
    ).toDF("event_id", "ts", "event_type", "value")
    val got = TimeSeries.ohlcBars(df).orderBy("period_start").collect()
    assert(got.length === 2)
    val h0 = got(0)
    assert(h0.getLong(1) === 0L)
    assert(h0.getDouble(2) === 5.0) // open
    assert(h0.getDouble(3) === 9.0) // high
    assert(h0.getDouble(4) === 1.0) // low
    assert(h0.getDouble(5) === 1.0) // close
    assert(h0.getLong(6) === 3L)
    assert(h0.getDouble(7) === 15.0)
    assert(got(1).getDouble(2) === 7.0)
  }

  test("same-timestamp rows resolve open/close by id — deterministic " +
      "under any partitioning") {
    val df = Seq(
      ev(1000L, 9L, 3.0), ev(1000L, 2L, 8.0), ev(1000L, 5L, 1.0)
    ).toDF("event_id", "ts", "event_type", "value")
    for (parts <- Seq(1, 7)) {
      val got = TimeSeries.ohlcBars(df.repartition(parts)).head()
      assert(got.getDouble(2) === 8.0, "open = smallest id")
      assert(got.getDouble(5) === 3.0, "close = largest id")
    }
  }

  test("plan is one hash aggregation pair — no window, no sort") {
    val df = Seq(ev(1000L, 1L, 5.0)).toDF("event_id", "ts", "event_type",
      "value")
    val plan = TimeSeries.ohlcBars(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
  }
}
