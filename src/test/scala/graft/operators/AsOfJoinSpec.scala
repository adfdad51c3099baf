package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    ("AAPL", ts("2024-01-01 10:00:05"), 1L),
    ("AAPL", ts("2024-01-01 10:00:00"), 2L), // exactly at a quote time
    ("AAPL", ts("2024-01-01 09:00:00"), 3L), // before any quote
    ("MSFT", ts("2024-01-01 10:00:10"), 4L)
  ).toDF("sym", "t_ts", "trade_id")

  private val quotes = Seq(
    ("AAPL", ts("2024-01-01 10:00:00"), 100.0),
    ("AAPL", ts("2024-01-01 10:00:03"), 101.0),
    ("MSFT", ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("sym", "q_ts", "px")

  private def run(inclusive: Boolean) =
    AsOfJoin.backward(trades, quotes, keys = Seq("sym"),
      leftTs = "t_ts", rightTs = "q_ts", payload = Seq("px"),
      inclusive = inclusive)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

  test("inclusive backward as-of picks latest quote at or before each trade") {
    val m = run(inclusive = true)
    assert(m(1L).contains(101.0))
    assert(m(2L).contains(100.0)) // equal-ts quote visible when inclusive
    assert(m(3L).isEmpty) // no earlier quote -> null
    assert(m(4L).contains(200.0))
  }

  test("exclusive backward as-of ignores equal-timestamp right rows") {
    val m = run(inclusive = false)
    assert(m(2L).isEmpty) // the 10:00:00 quote is no longer visible
    assert(m(1L).contains(101.0))
  }

  test("every left row survives (left-join semantics)") {
    assert(run(inclusive = true).size == trades.count())
  }

  private def runFwd(inclusive: Boolean) =
    AsOfJoin.forward(trades, quotes, keys = Seq("sym"),
      leftTs = "t_ts", rightTs = "q_ts", payload = Seq("px"),
      inclusive = inclusive)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

  test("inclusive forward as-of picks earliest quote at or after each trade") {
    val m = runFwd(inclusive = true)
    assert(m(3L).contains(100.0)) // 09:00 trade -> first quote of the day
    assert(m(2L).contains(100.0)) // equal-ts quote visible when inclusive
    assert(m(1L).isEmpty) // 10:00:05 trade: no later quote
    assert(m(4L).isEmpty) // MSFT 10:00:10: no later quote
  }

  test("exclusive forward as-of ignores equal-timestamp right rows") {
    val m = runFwd(inclusive = false)
    assert(m(2L).contains(101.0)) // skips the 10:00:00 quote, takes 10:00:03
    assert(m(3L).contains(100.0))
  }

  test("forward as-of payload stays atomic when right fields are null") {
    import org.apache.spark.sql.functions._
    val left = Seq(("k", ts("2024-01-01 00:00:00"), 1L))
      .toDF("k", "lts", "lid")
    val right = Seq(
      ("k", ts("2024-01-01 00:00:01"), Option.empty[Double], 10L),
      ("k", ts("2024-01-01 00:00:02"), Some(5.0), 20L)
    ).toDF("k", "rts", "v", "rid")
    val out = AsOfJoin.forward(left, right, Seq("k"), "lts", "rts",
      payload = Seq("v", "rid"), rightTiebreak = Some("rid"))
      .select(col("v"), col("rid")).head()
    // earliest right row (rid=10) wins as a UNIT: v must be null from THAT
    // row, not stitched from the later row
    assert(out.isNullAt(0))
    assert(out.getLong(1) == 10L)
  }

  test("null timestamps never match: a null-ts right row is no one's " +
      "as-of value, and a null-ts left row attaches nothing") {
    import org.apache.spark.sql.functions._
    // right side: one real quote plus a null-ts GHOST row; the ghost used
    // to sort FIRST in the backward scan (asc nulls-first) and become the
    // initial carried payload — every left row with no true predecessor
    // silently inherited it instead of null
    val left = Seq(
      ("k", Some(ts("2024-01-01 00:00:00")), 1L), // before any real quote
      ("k", Some(ts("2024-01-01 00:00:05")), 2L), // after the real quote
      ("k", Option.empty[Timestamp], 3L) // null left ts: no as-of point
    ).toDF("k", "lts", "lid")
    val right = Seq(
      ("k", Option.empty[Timestamp], -99.0), // ghost
      ("k", Some(ts("2024-01-01 00:00:02")), 7.0)
    ).toDF("k", "rts", "px")
    val back = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts",
      payload = Seq("px"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(back(1L).isEmpty, s"ghost payload leaked backward: ${back(1L)}")
    assert(back(2L).contains(7.0))
    assert(back(3L).isEmpty, "null-ts left row attached a payload")
    // forward: the ghost sorted LAST in the desc scan, where a null-ts
    // LEFT row would pick up the earliest real quote instead of null
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "lts", "rts",
      payload = Seq("px"))
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(fwd(1L).contains(7.0))
    assert(fwd(2L).isEmpty)
    assert(fwd(3L).isEmpty,
      s"null-ts left row attached a payload forward: ${fwd(3L)}")
  }
}
