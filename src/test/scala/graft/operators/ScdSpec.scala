package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Scd.scd2]] — interval semantics on a hand-built change stream. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // (key, ts, id, attr)
  private val stream = Seq(
    ("a", ts(1000), 1L, "bronze"),
    ("a", ts(2000), 2L, "bronze"), // no change: collapses
    ("a", ts(3000), 3L, "silver"),
    ("a", ts(4000), 4L, "gold"),
    ("b", ts(1500), 5L, "silver"),
    ("b", ts(1500), 6L, "gold"), // same ts: id breaks the tie
    ("c", ts(9000), 7L, null) // null attr opens an interval
  ).toDF("k", "ts", "id", "tier")

  private def run() = Scd.scd2(stream, "k", Seq("tier"), "ts", "id")
    .orderBy("k", "version").collect()

  test("consecutive identical attributes collapse; change opens, next " +
      "change closes, last stays current; versions number from 1") {
    val got = run()
    assert(got.length === 6)
    val a = got.filter(_.getString(0) == "a")
    assert(a.map(_.getString(1)).toSeq === Seq("bronze", "silver", "gold"))
    assert(a.map(_.getTimestamp(2)).toSeq ===
      Seq(ts(1000), ts(3000), ts(4000)))
    assert(a.map(r => Option(r.getTimestamp(3))).toSeq ===
      Seq(Some(ts(3000)), Some(ts(4000)), None))
    assert(a.map(_.getBoolean(4)).toSeq === Seq(false, false, true))
    assert(a.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L))
  }

  test("timestamp ties resolve by id: both regimes appear, the earlier " +
      "id's interval is zero-length") {
    val b = run().filter(_.getString(0) == "b")
    assert(b.map(_.getString(1)).toSeq === Seq("silver", "gold"))
    // silver's interval is [1500, 1500) — zero-length but recorded
    assert(b(0).getTimestamp(2) === ts(1500))
    assert(b(0).getTimestamp(3) === ts(1500))
    assert(b(1).isNullAt(3) && b(1).getBoolean(4))
  }

  test("null attribute opens an interval (null-safe change predicate)") {
    val c = run().filter(_.getString(0) == "c")
    assert(c.length === 1 && c(0).isNullAt(1) && c(0).getBoolean(4))
  }

  test("asOf returns the covering interval per key (half-open)") {
    val scd = Scd.scd2(stream, "k", Seq("tier"), "ts", "id")
    val at3500 = Scd.asOf(scd, lit(ts(3500)))
      .filter(col("k") === "a").collect()
    assert(at3500.length === 1 && at3500(0).getString(1) === "silver")
    // exactly on a boundary: the NEW interval owns it
    val at4000 = Scd.asOf(scd, lit(ts(4000)))
      .filter(col("k") === "a").collect()
    assert(at4000.length === 1 && at4000(0).getString(1) === "gold")
  }

  test("one hash exchange: the change-filter preserves partitioning and " +
      "sort, so the second window reuses the first's shuffle + sort") {
    val plan = Scd.scd2(stream, "k", Seq("tier"), "ts", "id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert("Sort ".r.findAllIn(plan).length === 1, plan)
    assert("Window".r.findAllIn(plan).length === 2, plan)
  }

  test("point-in-time enrichment law: as-of backward with version " +
      "tiebreak equals interval containment, including at zero-length " +
      "tie intervals (the later version owns the shared timestamp)") {
    val dim = Scd.scd2(stream, "k", Seq("tier"), "ts", "id")
      .select(col("k"), col("tier"), col("eff_from"), col("eff_to"),
        col("version"))
    val facts = stream.select(col("k"), col("ts"), col("id"))
    val got = AsOfJoin.backward(facts, dim.drop("eff_to"),
        keys = Seq("k"), leftTs = "ts", rightTs = "eff_from",
        payload = Seq("tier"), rightTiebreak = Some("version"))
      .orderBy("k", "ts", "id").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
    // containment replay: for each fact, the interval with
    // eff_from <= ts < eff_to (null eff_to = open)
    val intervals = dim.collect().map(r => (r.getString(0), r.getString(1),
      r.getTimestamp(2), Option(r.getTimestamp(3))))
    val want = facts.collect().map { f =>
      val (k, t, id) = (f.getString(0), f.getTimestamp(1), f.getLong(2))
      val covering = intervals.filter { case (ik, _, from, to) =>
        ik == k && !t.before(from) && to.forall(t.before)
      }
      assert(covering.length === 1, s"($k,$t) covered by ${covering.length}")
      (k, id, covering.head._2)
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === want.toSeq)
    // the tie key 'b': both facts at ts=1500 resolve to gold (version 2),
    // never silver's zero-length [1500,1500)
    assert(got.filter(_._1 == "b").forall(_._3 == "gold"))
  }

  test("multi-attribute tracking: change in ANY tracked column opens") {
    val df = Seq(
      ("k", ts(1), 1L, "x", 10),
      ("k", ts(2), 2L, "x", 20), // second attr changes
      ("k", ts(3), 3L, "x", 20) // no change
    ).toDF("k", "ts", "id", "a1", "a2")
    val got = Scd.scd2(df, "k", Seq("a1", "a2"), "ts", "id")
      .orderBy("version").collect()
    assert(got.length === 2)
    assert(got.map(_.getInt(2)).toSeq === Seq(10, 20))
  }
}
