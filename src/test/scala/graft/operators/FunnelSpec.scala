package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[Funnel]] — ordered 3-step conversion with a per-step attribution
  * window. Hand-built event streams pin the three semantic edges: strict
  * ordering (same-instant events do NOT chain), the earliest-qualifying
  * greedy rule, and the inclusive window boundary in exact microseconds.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, String)],
      windowSeconds: Long = 24L * 3600): (Long, Long, Long, Long) = {
    val df = rows.toDF("user_id", "ts", "event_type")
    val r = Funnel.conversion(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSeconds).collect()(0)
    (r.getAs[Long]("n_users"), r.getAs[Long]("n_s1"),
      r.getAs[Long]("n_s12"), r.getAs[Long]("n_s123"))
  }

  test("full conversion in order counts at every step") {
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase")))
    assert(got === ((1L, 1L, 1L, 1L)))
  }

  test("out-of-order steps do not chain; strict ordering excludes " +
      "same-instant events") {
    val got = run(Seq(
      // user 1: click BEFORE first view — no s12
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "view"),
      // user 2: click at the exact view instant — strict '>' excludes
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "click"),
      // user 3: purchase only — not even s1
      (3L, ts("2024-01-01 09:00:00"), "purchase")))
    assert(got === ((3L, 2L, 0L, 0L)))
  }

  test("earliest-qualifying instance anchors the next step's window") {
    val got = run(Seq(
      // first view 10:00; clicks at 10:30 and 23:00 — the FIRST click
      // (10:30) anchors the purchase window, so a purchase 25h after the
      // later click but within 24h of nothing fails ...
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 23:00:00"), "click"),
      (1L, ts("2024-01-02 12:00:00"), "purchase"),
      // ... while user 2's purchase sits within 24h of their only click
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 23:00:00"), "click"),
      (2L, ts("2024-01-02 12:00:00"), "purchase")))
    // user 1: purchase is 25.5h after the chosen (first) click -> no s123
    assert(got === ((2L, 2L, 2L, 1L)))
  }

  test("window boundary is inclusive at exactly windowSeconds") {
    val got = run(Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-02 10:00:00"), "click"),          // exactly 24h: in
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-02 10:00:00.000001"), "click")))  // 24h + 1us: out
    assert(got === ((2L, 2L, 1L, 0L)))
  }

  test("N-step generalization: a 4-step funnel chains greedily and a " +
      "1-step funnel reports reach only") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:10:00"), "b"),
      (1L, ts("2024-01-01 10:20:00"), "c"),
      (1L, ts("2024-01-01 10:30:00"), "d"),
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:10:00"), "b"))
      .toDF("user_id", "ts", "event_type")
    val four = Funnel.conversion(df, "user_id", "ts", "event_type",
      Seq("a", "b", "c", "d")).collect()(0)
    assert(four.getAs[Long]("n_s1") === 2L)
    assert(four.getAs[Long]("n_s12") === 2L)
    assert(four.getAs[Long]("n_s123") === 1L)
    assert(four.getAs[Long]("n_s1234") === 1L)
    assert(four.getAs[Double]("rate_s4") === 1.0)
    val one = Funnel.conversion(df, "user_id", "ts", "event_type",
      Seq("b")).collect()(0)
    assert(one.getAs[Long]("n_s1") === 2L)
    assert(!one.schema.fieldNames.contains("rate_s2"))
  }

  test("transition matrix: exact pair counts and row-normalized " +
      "probabilities, per-user sequences never mix") {
    val df = Seq(
      // u1: view > click > view > buy ; u2: view > view
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 12L, ts("2024-01-01 10:02:00"), "view"),
      (1L, 13L, ts("2024-01-01 10:03:00"), "buy"),
      (2L, 20L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 21L, ts("2024-01-01 10:05:00"), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Funnel.transitionMatrix(df, "user_id", "ts", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from view: click 1, buy 1 (u1 pos3), view 1 (u2) -> p = 1/3 each;
    // from click: view 1 -> p = 1.0. u2's last view chains to NOTHING
    // from u1 (partitions don't mix)
    assert(got === Map(
      ("view", "click") -> ((1L, 1.0 / 3.0)),
      ("view", "buy") -> ((1L, 1.0 / 3.0)),
      ("view", "view") -> ((1L, 1.0 / 3.0)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("rates are exact ratios and zero-guarded") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.conversion(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()(0)
    assert(r.getAs[Long]("n_s1") === 0L)
    assert(r.getAs[Double]("rate_s2") === 0.0)
    assert(r.getAs[Double]("rate_s3") === 0.0)
  }
}
