package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Anomaly.hourlyZScores]] — trailing z-scores with exact trailing
  * sums on a hand-built series.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def at(hour: Long, k: Int) =
    (0 until k).map(i => (new Timestamp(hour * 3600000L + i), "click"))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("z-score matches the hand-computed trailing statistics; " +
      "warm-up and zero-variance rows are unscored") {
    // hours 0..6 counts 1,2,3,4,5,6; hour 7 spikes to 30
    val counts = Seq(1, 2, 3, 4, 5, 6, 7, 30)
    val ev = counts.zipWithIndex
      .flatMap { case (k, h) => at(h.toLong, k) }
      .toDF("ts", "event_type")
      .select(col("event_type"), col("ts"))
    val got = Anomaly.hourlyZScores(ev, minTrailing = 6)
      .orderBy("period_start").collect()
    // first 6 hours: trailing count < 6 -> no score
    (0 until 6).foreach { i =>
      assert(got(i).isNullAt(4) && got(i).isNullAt(5), s"row $i")
    }
    // hour 6: trailing = counts of hours 0..5 -> mean 3.5, popvar 35/12
    val m6 = 3.5
    val v6 = (1 + 4 + 9 + 16 + 25 + 36) / 6.0 - m6 * m6
    assert(got(6).getDouble(4) === round6(m6))
    assert(got(6).getDouble(5) === round6((7 - m6) / math.sqrt(v6)))
    // hour 7: trailing = hours 0..6 (all within 24h)
    val m7 = (1 + 2 + 3 + 4 + 5 + 6 + 7) / 7.0
    val v7 = (1 + 4 + 9 + 16 + 25 + 36 + 49) / 7.0 - m7 * m7
    assert(got(7).getDouble(5) === round6((30 - m7) / math.sqrt(v7)))
    assert(got(7).getLong(3) === 7L)
  }

  test("a gap in the series widens the RANGE frame instead of sliding " +
      "rows; constant series has null z") {
    // hours 0..5 constant 4, hour 30 (beyond the 24h window of 0..5)
    val ev = ((0 to 5).flatMap(h => at(h.toLong, 4)) ++ at(30L, 9))
      .toDF("ts", "event_type").select(col("event_type"), col("ts"))
    val got = Anomaly.hourlyZScores(ev, minTrailing = 6)
      .orderBy("period_start").collect()
    // hour 30's trailing frame [6h..29h] is EMPTY -> no score
    val last = got.last
    assert(last.getLong(2) === 9L)
    assert(last.getLong(3) === 0L && last.isNullAt(5))
    // and a constant-variance case: hours 0..6 constant, hour 6 scored?
    val ev2 = (0 to 6).flatMap(h => at(h.toLong, 4))
      .toDF("ts", "event_type").select(col("event_type"), col("ts"))
    val got2 = Anomaly.hourlyZScores(ev2, minTrailing = 6)
      .orderBy("period_start").collect()
    val h6 = got2.last
    assert(h6.getLong(3) === 6L)
    assert(h6.getDouble(4) === 4.0) // trailing mean defined
    assert(h6.isNullAt(5))          // zero variance -> no z
  }

  test("ewma matches the hand-folded recurrence and seeds from the " +
      "first observed period") {
    // hours 0..3 counts 10, 20, 30, 40; alpha = 0.5 for exact halves
    val ev = Seq(10, 20, 30, 40).zipWithIndex
      .flatMap { case (k, h) => at(h.toLong, k) }
      .toDF("ts", "event_type").select(col("event_type"), col("ts"))
    val got = Anomaly.ewmaSmooth(ev, alpha = 0.5)
      .orderBy("period_start").collect()
    assert(got.map(_.getLong(2)).toSeq === Seq(10L, 20L, 30L, 40L))
    // e0=10, e1=.5*20+.5*10=15, e2=.5*30+.5*15=22.5, e3=.5*40+.5*22.5
    assert(got.map(_.getDouble(3)).toSeq === Seq(10.0, 15.0, 22.5, 31.25))
  }

  test("ewma recurrence steps per OBSERVED period: a gap contributes " +
      "nothing (no implicit zero-fill)") {
    val ev = (at(0L, 8) ++ at(100L, 16))
      .toDF("ts", "event_type").select(col("event_type"), col("ts"))
    val got = Anomaly.ewmaSmooth(ev, alpha = 0.5)
      .orderBy("period_start").collect()
    assert(got.length === 2)
    // one recurrence step across the gap: .5*16 + .5*8 = 12
    assert(got(1).getDouble(3) === 12.0)
  }

  test("ewma types are independent series; single-period series emits " +
      "its own count as the seed") {
    val ev = (at(0L, 4) ++
      Seq((new java.sql.Timestamp(0L), "view"),
        (new java.sql.Timestamp(3600000L), "view"))
        .flatMap { case (t, k) => Seq((t, k)) })
      .toDF("ts", "event_type").select(col("event_type"), col("ts"))
    val got = Anomaly.ewmaSmooth(ev, alpha = 0.2)
      .orderBy("event_type", "period_start").collect()
    val clicks = got.filter(_.getString(0) == "click")
    val views = got.filter(_.getString(0) == "view")
    assert(clicks.length === 1 && clicks(0).getDouble(3) === 4.0)
    assert(views.length === 2 && views(0).getDouble(3) === 1.0)
    // 0.2*1 + 0.8*1 = 1.0
    assert(views(1).getDouble(3) === 1.0)
  }

  test("ewma_scan kernel: exact left fold, empty array, null-element " +
      "rejection") {
    import graft.functions.expr.SeriesExprs
    val df = Seq(Tuple1(Array(1.0, 2.0, 3.0))).toDF("xs")
    val got = df.select(SeriesExprs.ewmaScan(col("xs"), 0.5).as("e"))
      .head().getSeq[Double](0)
    assert(got === Seq(1.0, 1.5, 2.25))
    val empty = Seq(Tuple1(Array.empty[Double])).toDF("xs")
    assert(empty.select(SeriesExprs.ewmaScan(col("xs"), 0.5))
      .head().getSeq[Double](0).isEmpty)
    val bad = Seq(Tuple1(Array[java.lang.Double](1.0, null, 3.0)))
      .toDF("xs")
    val e = intercept[Exception] {
      bad.select(SeriesExprs.ewmaScan(col("xs"), 0.5)).collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      ((t.getMessage != null && t.getMessage.contains("ewma_scan")) ||
        mentions(t.getCause))
    assert(mentions(e))
  }
}
