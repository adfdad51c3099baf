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

  test("pointInIntervalLeftOuter equals the naive LEFT JOIN: matched " +
      "pairs intact, unmatched points null-extended exactly once, " +
      "duplicate point rows keep their multiplicity") {
    // pid 4 is duplicated and unmatched; pid 2 matches two intervals;
    // a long-tail spanning interval and an inverted one are planted
    val points = (Seq((1L, 5L), (2L, 10L), (3L, 25L)) ++
      Seq((4L, 99L), (4L, 99L))).toDF("pid", "x")
    val ivs = Seq(("A", 0L, 10L), ("B", 8L, 30L), ("C", 40L, 40L),
      ("INV", 500L, -500L)).toDF("name", "s", "e")
    val got = RangeJoin.pointInIntervalLeftOuter(points, ivs, "x", "s",
        "e", bucketWidth = 10L)
      .select("pid", "name").as[(Long, Option[String])]
      .collect().toList.sortBy(r => (r._1, r._2))
    val naive = points.join(ivs,
        col("s") <= col("x") && col("x") <= col("e"), "left")
      .select("pid", "name").as[(Long, Option[String])]
      .collect().toList.sortBy(r => (r._1, r._2))
    assert(got == naive)
    assert(got.count(_ == (4L, None)) == 2) // multiplicity preserved
    assert(got.count(_._1 == 2L) == 2)      // both A and B matched
  }

  test("pointInIntervalFullOuter equals the naive FULL JOIN: matched " +
      "pairs once, unmatched points AND unmatched intervals " +
      "null-extended (inverted interval included), duplicates keep " +
      "their multiplicity on both sides") {
    // pid 4 duplicated and unmatched; interval C covers no point;
    // INV is inverted (can never match but must appear null-extended);
    // interval B duplicated to check interval-side multiplicity
    val points = (Seq((1L, 5L), (2L, 10L), (3L, 25L)) ++
      Seq((4L, 99L), (4L, 99L))).toDF("pid", "x")
    val ivs = Seq(("A", 0L, 10L), ("B", 8L, 30L), ("B", 8L, 30L),
      ("C", 40L, 40L), ("INV", 500L, -500L)).toDF("name", "s", "e")
    def key(r: (Option[Long], Option[String])) = (r._1, r._2)
    val got = RangeJoin.pointInIntervalFullOuter(points, ivs, "x", "s",
        "e", bucketWidth = 10L)
      .select("pid", "name").as[(Option[Long], Option[String])]
      .collect().toList.sortBy(key)
    val naive = points.join(ivs,
        col("s") <= col("x") && col("x") <= col("e"), "full")
      .select("pid", "name").as[(Option[Long], Option[String])]
      .collect().toList.sortBy(key)
    assert(got == naive)
    assert(got.count(_ == (Some(4L), None)) == 2)   // dup point survives x2
    assert(got.count(_ == (None, Some("B"))) == 0)  // B matched: no null row
    assert(got.count(_._2 == Some("B")) == 4)       // 2 copies x 2 points
    assert(got.contains((None, Some("C"))))         // empty interval
    assert(got.contains((None, Some("INV"))))       // inverted surfaces
  }

  test("pointInIntervalLeftSemi equals the naive LEFT SEMI: matched " +
      "points once each, duplicates keep multiplicity, NULL axis " +
      "excluded, empty- and all-match corpora exact") {
    val points = (Seq((1L, Option(5L)), (2L, Option(10L)),
      (3L, Option(25L))) ++
      Seq((4L, Option(99L)), (4L, Option(99L)), (9L, Option.empty[Long])))
      .toDF("pid", "x")
    val ivs = Seq(("A", 0L, 10L), ("B", 8L, 30L), ("C", 40L, 40L),
      ("INV", 500L, -500L)).toDF("name", "s", "e")
    def naive(iv: org.apache.spark.sql.DataFrame) = points.join(iv,
        col("s") <= col("x") && col("x") <= col("e"), "left_semi")
      .select("pid").as[Long].collect().toList.sorted
    val got = RangeJoin.pointInIntervalLeftSemi(points, ivs, "x", "s",
        "e", bucketWidth = 10L)
      .select("pid").as[Long].collect().toList.sorted
    assert(got == naive(ivs))
    assert(got == List(1L, 2L, 3L)) // pid 2 once despite two intervals
    // empty-match corpus: no interval covers anything
    val none = Seq(("Z", 1000L, 2000L)).toDF("name", "s", "e")
    assert(RangeJoin.pointInIntervalLeftSemi(points, none, "x", "s", "e",
      bucketWidth = 10L).count() == 0L)
    // all-match corpus: every non-null point covered, multiplicity kept
    val all = Seq(("W", -1000L, 1000L)).toDF("name", "s", "e")
    assert(RangeJoin.pointInIntervalLeftSemi(points, all, "x", "s", "e",
        bucketWidth = 10L)
      .select("pid").as[Long].collect().toList.sorted ==
      List(1L, 2L, 3L, 4L, 4L))
  }

  test("pointInIntervalLeftAnti equals the naive LEFT ANTI: uncovered " +
      "points once each, duplicates keep multiplicity, NULL axis KEPT, " +
      "empty- and all-match corpora exact") {
    val points = (Seq((1L, Option(5L)), (2L, Option(10L)),
      (3L, Option(25L))) ++
      Seq((4L, Option(99L)), (4L, Option(99L)), (9L, Option.empty[Long])))
      .toDF("pid", "x")
    val ivs = Seq(("A", 0L, 10L), ("B", 8L, 30L), ("C", 40L, 40L),
      ("INV", 500L, -500L)).toDF("name", "s", "e")
    val naive = points.join(ivs,
        col("s") <= col("x") && col("x") <= col("e"), "left_anti")
      .select("pid").as[Long].collect().toList.sorted
    val got = RangeJoin.pointInIntervalLeftAnti(points, ivs, "x", "s",
        "e", bucketWidth = 10L)
      .select("pid").as[Long].collect().toList.sorted
    assert(got == naive)
    assert(got == List(4L, 4L, 9L)) // NULL-axis pid 9 kept (NOT EXISTS)
    // all-match corpus: only the NULL-axis row survives
    val all = Seq(("W", -1000L, 1000L)).toDF("name", "s", "e")
    assert(RangeJoin.pointInIntervalLeftAnti(points, all, "x", "s", "e",
        bucketWidth = 10L)
      .select("pid").as[Long].collect().toList == List(9L))
    // empty-match corpus: everything survives
    val none = Seq(("Z", 1000L, 2000L)).toDF("name", "s", "e")
    assert(RangeJoin.pointInIntervalLeftAnti(points, none, "x", "s", "e",
      bucketWidth = 10L).count() == points.count())
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

  test("intervalOverlap equals the naive overlap join, emits each pair " +
      "exactly once across multi-bucket spans, and excludes " +
      "empty/inverted and merely-touching intervals") {
    // L1 spans many width-10 buckets; L3 is empty [50,50); L4 inverted
    val left = Seq((1L, 0L, 35L), (2L, 12L, 14L), (3L, 50L, 50L),
      (4L, 70L, 60L)).toDF("lid", "ls", "le")
    // R1 overlaps L1 across buckets; R2 touches L1 end-to-start (35=35,
    // half-open => NO pair); R3 long interval overlapping L1 and L2
    val right = Seq((7L, 5L, 30L), (8L, 35L, 40L), (9L, -5L, 100L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le",
        "rs", "re", bucketWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    // exactly-once: list equality after sort, not set equality
    assert(got.sorted ===
      List((1L, 7L), (1L, 9L), (2L, 7L), (2L, 9L)).sorted)
    val naive = left.filter(col("le") > col("ls"))
      .join(right.filter(col("re") > col("rs")),
        greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got.toSet === naive)
  }

  test("intervalOverlap with extraKeys pairs only within the key") {
    val left = Seq((1L, 10L, 0L, 100L), (2L, 20L, 0L, 100L))
      .toDF("lid", "u", "ls", "le")
    val right = Seq((7L, 10L, 50L, 60L), (8L, 30L, 50L, 60L))
      .toDF("rid", "u", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le",
        "rs", "re", bucketWidth = 10L, extraKeys = Seq("u"))
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got === List((1L, 7L)))
  }

  test("an axis-spanning interval takes the salted long-tail route: " +
      "exact multiset, no axis tiling (overlap join)") {
    // at bucketWidth=1 the planted interval would tile 2e12 buckets —
    // sequence() alone would refuse long before the shuffle died. The
    // guard must route it to the bounded salt keys and still pair it with
    // every live right interval, exactly once.
    val left = ((0L until 40L).map(i => (i, i * 10, i * 10 + 25)) :+
      (999L, -1000000000000L, 1000000000000L)).toDF("lid", "ls", "le")
    val right = (0L until 40L).map(i => (i, i * 7 - 100, i * 7 - 60))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le",
        "rs", "re", bucketWidth = 1L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val naive = left.join(right,
        col("le") > col("ls") && col("re") > col("rs") &&
          greatest(col("ls"), col("rs")) < least(col("le"), col("re")))
      .select("lid", "rid").as[(Long, Long)].collect().toList
    assert(got.sorted === naive.sorted) // multiset: exactly-once emission
    // the spanning interval pairs with every right interval
    assert(got.count(_._1 == 999L) == 40)
  }

  test("axis-spanning intervals route long-tail in pointInInterval too, " +
      "mixed with short ones") {
    val points = (0L until 50L).map(i => (i, i * 3 - 60)).toDF("pid", "x")
    val ivs = Seq(("ALL", -2000000000000L, 2000000000000L),
      ("A", 0L, 10L), ("B", -30L, -20L)).toDF("name", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "s", "e",
        bucketWidth = 1L)
      .select("pid", "name").as[(Long, String)].collect().toList
    val naive = points.join(ivs,
        col("s") <= col("x") && col("x") <= col("e"))
      .select("pid", "name").as[(Long, String)].collect().toList
    assert(got.sorted === naive.sorted)
    assert(got.count(_._2 == "ALL") == 50)
  }

  test("an inverted interval (end << start) never reaches sequence(): " +
      "routed to the salt arm and rejected by the exact filter") {
    // before the eb >= sb guard this planted row passed the span-only
    // check (its span is hugely NEGATIVE) and sequence(sb, eb) built a
    // ~4e12-element descending array, killing the executor
    val points = (0L until 20L).map(i => (i, i * 5 - 30)).toDF("pid", "x")
    val ivs = Seq(("INV", 2000000000000L, -2000000000000L),
      ("A", 0L, 10L), ("B", -30L, -20L)).toDF("name", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "s", "e",
        bucketWidth = 1L)
      .select("pid", "name").as[(Long, String)].collect().toList
    val naive = points.join(ivs,
        col("s") <= col("x") && col("x") <= col("e"))
      .select("pid", "name").as[(Long, String)].collect().toList
    assert(got.sorted === naive.sorted)
    assert(!got.exists(_._2 == "INV"))
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
