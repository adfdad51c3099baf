package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches exactly, inclusive ends, across buckets") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L))
      .toDF("pid", "x")
    // interval B spans several width-10 buckets; C is empty-range [40,40]
    val ivs = Seq(("A", 0L, 10L), ("B", 8L, 30L), ("C", 40L, 40L))
      .toDF("name", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "s", "e",
      bucketWidth = 10L)
      .select("pid", "name").as[(Long, String)].collect().toSet
    // x=5 -> A; x=10 -> A (inclusive end) and B; x=25 -> B; x=99 -> none
    assert(got == Set((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B")))
  }

  test("negative coordinates bucket correctly (floor, not toward-zero)") {
    val points = Seq((1L, -5L), (2L, -15L)).toDF("pid", "x")
    val ivs = Seq(("N", -20L, -1L)).toDF("name", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "s", "e",
      bucketWidth = 10L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("bandJoin equals the naive |l - r| <= tol join with extra keys") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 100L))
      .toDF("lid", "u", "lt")
    val right = Seq((7L, 10L, 104L), (8L, 10L, 250L), (9L, 20L, 100L),
      (10L, 30L, 100L)).toDF("rid", "u", "rt")
    val got = RangeJoin.bandJoin(left, right, "lt", "rt", tolerance = 5L,
      extraKeys = Seq("u"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, Seq("u"))
      .filter(abs(col("lt") - col("rt")) <= 5L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 7L), (3L, 9L)))
  }

  test("the range join plans as a hash equi-join, not a nested loop") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("tsu").as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("tsu").as("click_ts"))
    val p = RangeJoin.bandJoin(errors, clicks, "err_ts", "click_ts",
      21600000000L, extraKeys = Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Join") || p.contains("join"), p.take(3000))
  }
}
