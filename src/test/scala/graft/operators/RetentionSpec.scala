package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[Retention]] — cohort retention matrix. 10-second periods keep the
  * hand computation readable; the period arithmetic under test is the
  * same exact integer flooring the weekly default uses.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(sec * 1000L)

  test("cohort assignment, offsets, distinct actives and exact ratios") {
    // periods of 10s: u1,u2 first active in period 0; u3 in period 1.
    // u1 has TWO events in period 0 — distinctness keeps (0,0) at 2.
    val events = Seq(
      (1L, at(0)), (1L, at(5)), (1L, at(15)), (1L, at(25)),
      (2L, at(2)), (2L, at(22)),
      (3L, at(12)), (3L, at(35)))
      .toDF("user_id", "ts")
    val got = Retention.cohorts(events, "user_id", "ts",
        periodSeconds = 10L)
      .orderBy("cohort_period", "period_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 2L, 1.0),   // u1+u2 active in their first period
      (0L, 1L, 1L, 2L, 0.5),   // only u1 at offset 1
      (0L, 2L, 2L, 2L, 1.0),   // u1+u2 at offset 2
      (10L, 0L, 1L, 1L, 1.0),  // u3's cohort starts at period 1 (=10s)
      (10L, 2L, 1L, 1L, 1.0))) // u3 again at offset 2 (35s -> period 3)
  }

  test("offset-0 cell equals the cohort size for every cohort") {
    val rnd = new scala.util.Random(7L)
    val events = (0 until 400).map { _ =>
      (rnd.nextInt(25).toLong, at(rnd.nextInt(100).toLong))
    }.toDF("user_id", "ts")
    val rows = Retention.cohorts(events, "user_id", "ts",
        periodSeconds = 10L)
      .filter($"period_offset" === 0L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") === r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") === 1.0)
    }
  }

  test("pre-epoch timestamps floor (not truncate) into their period") {
    // -5s with 10s periods: mathematical floor is period -1, so the
    // cohort label is -10 — truncation toward zero would mislabel it 0
    val events = Seq((1L, at(-5)), (1L, at(5))).toDF("user_id", "ts")
    val got = Retention.cohorts(events, "user_id", "ts",
        periodSeconds = 10L)
      .orderBy("period_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((-10L, 0L, 1L), (-10L, 1L, 1L)))
  }
}
