package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew tooling: the hotspot diagnostic must rank keys by OUTPUT pair
  * count with a deterministic tie-break, and the salted mitigation must
  * be result-identical to the plain join it replaces.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("joinHotspots ranks by n_left * n_right (not per-side counts) " +
      "and breaks ties by key ascending") {
    // key 1: 3x2=6 pairs; key 2: 1x5=5; key 3: 4x0 -> absent (no pairs);
    // keys 4,5: 2x1=2 each — tie broken by key
    val left = Seq(1L, 1L, 1L, 2L, 3L, 3L, 3L, 3L, 4L, 4L, 5L, 5L)
      .toDF("k")
    val right = (Seq(1L, 1L) ++ Seq.fill(5)(2L) ++ Seq(4L, 5L)).toDF("k")
    val got = Skew.joinHotspots(left, right, "k", topN = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 6L), (2L, 1L, 5L, 5L),
      (4L, 2L, 1L, 2L)))
  }

  test("joinHotspots output is bounded and planned as histogram join + " +
      "top-N (no nested loop; keys with zero pairs never appear)") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val df = Skew.joinHotspots(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"), "user_id", topN = 10)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val rows = df.collect()
    assert(rows.length <= 10)
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("joinHotspots multiplies pair counts in decimal but publishes " +
      "BIGINT (the accounting-overflow convention)") {
    val l = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "a")
    val r = Seq((1L, "p"), (2L, "q")).toDF("k", "b")
    val df = Skew.joinHotspots(l, r, "k", topN = 5)
    assert(df.schema("n_pairs").dataType ==
      org.apache.spark.sql.types.LongType, "n_pairs type drifted")
    val got = df.collect().map(x => x.getAs[Long]("k") ->
      x.getAs[Long]("n_pairs")).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("saltedJoin equals the plain inner equi-join (multiset)") {
    val big = (0L until 500L).map(i => (i, i % 7)).toDF("id", "k")
    val small = Seq((0L, "a"), (1L, "b"), (6L, "c")).toDF("k", "v")
    val want = big.join(small, Seq("k")).select("id", "v")
      .as[(Long, String)].collect().toSeq.sorted
    val got = Skew.saltedJoin(big, small, "k").select("id", "v")
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == want)
  }
}
