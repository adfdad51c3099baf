package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The conf-gated optimizer rewrite must (a) replace the nested-loop plan
  * of a naive BETWEEN join with a hash equi-join on the bucket keys, and
  * (b) preserve the join's multiset result EXACTLY — including strict
  * bounds, extra non-equi predicates, negative coordinates, and the
  * pathological axis-spanning interval that takes the salted long-tail
  * route. Enabled via `spark.experimental.extraOptimizations` here (the
  * packaged path is GraftExtensions.injectOptimizerRule); every test
  * restores the session state it touches.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](binSize: Long)(f: => A): A =
    withRuleConf(binSize.toString)(f)

  private def withRuleConf[A](binSize: String)(f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(spark)
    spark.conf.set("spark.graft.rangeJoin.binSize", binSize)
    // the fixtures here are deliberately tiny; disable the stats-aware
    // small-side guard so the rewrite machinery under test fires (the
    // guard's own tests below leave it at its default)
    spark.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    try f finally {
      spark.experimental.extraOptimizations = prev
      spark.conf.unset("spark.graft.rangeJoin.binSize")
      spark.conf.unset("spark.graft.rangeJoin.smallSideBytes")
    }
  }

  private val points = (0L until 200L).map(i => (i, i * 3 - 100))
    .toDF("pid", "x")
  private val ivs = ((0L until 40L).map(i => (i, i * 10 - 120, i * 10 - 80))
    :+ (999L, -2000000000000L, 2000000000000L))
    .toDF("iid", "lo", "hi")

  private def naive: Seq[(Long, Long)] =
    points.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted

  test("rewrites the BETWEEN join to a hash equi-join with the exact " +
      "multiset result (spanning interval included)") {
    val want = naive
    withRule(7L) {
      val df = points.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
      val got = df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == want)
    }
  }

  test("SQL surface: spark.sql BETWEEN join takes the rewrite too") {
    points.createOrReplaceTempView("pts")
    ivs.createOrReplaceTempView("iv")
    try withRule(7L) {
      val df = spark.sql(
        "SELECT pid, iid FROM pts JOIN iv ON x BETWEEN lo AND hi")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.as[(Long, Long)].collect().toSeq.sorted == naive)
    } finally {
      spark.catalog.dropTempView("pts")
      spark.catalog.dropTempView("iv")
    }
  }

  test("strict bounds and extra non-equi predicates stay exact (hull " +
      "tiling + original-predicate refilter)") {
    val want = points.join(ivs,
        col("x") > col("lo") && col("x") < col("hi") &&
          col("pid") =!= col("iid"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(10L) {
      val df = points.join(ivs,
        col("x") > col("lo") && col("x") < col("hi") &&
          col("pid") =!= col("iid"))
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
    }
  }

  test("points on the RIGHT side of the join rewrite symmetrically") {
    val want = ivs.join(points,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(7L) {
      val df = ivs.join(points,
        col("x") >= col("lo") && col("x") <= col("hi"))
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
    }
  }

  test("interval-overlap shape rewrites too: l.s < r.e AND r.s < l.e, " +
      "exact multiset incl. inverted and spanning intervals") {
    // inverted (id 500) and axis-spanning (id 999) rows planted; strict
    // overlap predicates
    val l = ((0L until 60L).map(i => (i, i * 5 - 50, i * 5 - 20)) ++
      Seq((500L, 40L, 10L), (999L, -1000000000000L, 1000000000000L)))
      .toDF("lid", "lst", "len")
    val r = ((0L until 60L).map(i => (i, i * 7 - 80, i * 7 - 30)) ++
      Seq((600L, 90L, 60L))).toDF("rid", "rst", "ren")
    val cond = col("lst") < col("ren") && col("rst") < col("len")
    val want = l.join(r, cond)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    withRule(8L) {
      val df = l.join(r, cond)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
      val got = df.select("lid", "rid")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == want)
      // the planted inverted interval matched naive-style (the two
      // inequalities don't require s < e) — the rewrite must keep it
      assert(want.exists(_._1 == 500L) == got.exists(_._1 == 500L))
      assert(got.count(_._1 == 999L) == want.count(_._1 == 999L))
    }
  }

  test("overlap salted matrix: spanning intervals on BOTH sides — " +
      "long x long, long x short, short x long each land exactly once") {
    // left: tiled short rows + an inverted row + TWO axis-spanning rows
    // (long x long pairs must rendezvous in exactly one salt: left-long
    // indexes kind 1 only, right-long probes kind 1 once); right: short
    // rows + its own spanning rows + an inverted row. A small cap (3)
    // additionally routes the WIDEST finite rows long, mixing all four
    // kind combinations in one join.
    val l = ((0L until 40L).map(i => (i, i * 5 - 50, i * 5 - 20)) ++
      Seq((500L, 40L, 10L), (998L, -1000000000000L, 1000000000000L),
        (999L, -900000000000L, 900000000000L)))
      .toDF("lid", "lst", "len")
    val r = ((0L until 40L).map(i => (i, i * 7 - 80, i * 7 - 30)) ++
      Seq((600L, 90L, 60L), (888L, -800000000000L, 800000000000L),
        (889L, -700000000000L, 700000000000L)))
      .toDF("rid", "rst", "ren")
    val cond = col("lst") < col("ren") && col("rst") < col("len")
    val want = l.join(r, cond)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    for (cap <- Seq(3, 256)) {
      withRule(8L) {
        spark.conf.set("spark.graft.rangeJoin.maxSpanBuckets", cap.toString)
        try {
          val df = l.join(r, cond)
          val p = df.queryExecution.executedPlan.toString
          assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
          assert(!p.contains("CartesianProduct"), p.take(3000))
          val got = df.select("lid", "rid")
            .as[(Long, Long)].collect().toSeq.sorted
          assert(got == want, s"cap=$cap")
          // the long x long pairs are present exactly once
          assert(got.count(p => p._1 == 998L && p._2 == 888L) == 1)
          assert(got.count(p => p._1 == 999L && p._2 == 889L) == 1)
        } finally spark.conf.unset("spark.graft.rangeJoin.maxSpanBuckets")
      }
    }
  }

  test("non-strict overlap (touching intervals) stays exact under the " +
      "closed-hull tiling") {
    val l = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("lid", "lst", "len")
    val r = Seq((7L, 10L, 20L), (8L, 30L, 40L)).toDF("rid", "rst", "ren")
    val cond = col("lst") <= col("ren") && col("rst") <= col("len")
    val want = l.join(r, cond)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    withRule(4L) {
      val got = l.join(r, cond).select("lid", "rid")
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == want) // touch pairs (1,7),(2,7),(2,8) included once
    }
  }

  test("DATE axis: BETWEEN over date columns rewrites (buckets on epoch " +
      "days) with the exact result") {
    val pts = (0 until 120).map(i => (i.toLong, i))
      .toDF("pid", "off")
      .select(col("pid"), expr("date_add(DATE'2024-01-01', off)").as("d"))
    val iv = (0 until 12).map(i => (i.toLong, i * 11, i * 11 + 6))
      .toDF("iid", "s", "e")
      .select(col("iid"),
        expr("date_add(DATE'2024-01-01', s)").as("dlo"),
        expr("date_add(DATE'2024-01-01', e)").as("dhi"))
    val cond = col("d") >= col("dlo") && col("d") <= col("dhi")
    val want = pts.join(iv, cond)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(7L) { // 7-day buckets
      val df = pts.join(iv, cond)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
    }
  }

  test("TIMESTAMP axis: the naive time-window join rewrites (buckets on " +
      "epoch micros) with the exact result") {
    val pts = (0 until 200).map(i => (i.toLong, i * 137L))
      .toDF("pid", "m")
      .select(col("pid"),
        expr("timestamp_micros(m * 60000000)").as("ts")) // minutes apart
    val iv = (0 until 15).map(i => (i.toLong, i * 900L, i * 900L + 360L))
      .toDF("iid", "s", "e")
      .select(col("iid"),
        expr("timestamp_micros(s * 60000000)").as("tlo"),
        expr("timestamp_micros(e * 60000000)").as("thi"))
    val cond = col("ts") >= col("tlo") && col("ts") <= col("thi")
    val want = pts.join(iv, cond)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(6L * 3600L * 1000000L) { // 6h buckets in micros
      val df = pts.join(iv, cond)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
    }
  }

  test("binSize=auto derives the width from the interval side (p75 " +
      "span), attributes it per thread, and stays exact") {
    val want = naive
    withRuleConf("auto") {
      val df = points.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
      // every finite interval in `ivs` has span exactly 40; the one
      // axis-spanning outlier sits above p75 — the derived width is 40,
      // attributed to THIS thread (the query planned here)
      assert(RangeJoinRewrite.lastDerivedWidth.contains(40L))
    }
  }

  test("generic theta bounds (multi-attribute arithmetic) are NOT " +
      "rewritten — the shape sanity check rejects derived hulls") {
    withRule(7L) {
      val p = points.join(ivs,
          col("x") >= col("lo") + col("hi") - col("hi") &&
            col("x") <= col("hi") + col("lo") - col("lo"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__gkey"), p.take(3000))
    }
  }

  test("LEFT OUTER BETWEEN join rewrites: exact multiset vs the naive " +
      "plan, unmatched points null-extended, no nested loop") {
    // points far outside every interval guarantee unmatched rows; the
    // axis-spanning interval exercises the salted arm under outer
    val pts = ((0L until 80L).map(i => (i, i * 3 - 100)) ++
      Seq((900L, 500000L), (901L, -500000L))).toDF("pid", "x")
    // the spanning interval [−2e12, 2e12] covers even the far points, so
    // a second frame without it forces truly unmatched rows; both naive
    // baselines are computed BEFORE the rule is installed
    val noSpan = ivs.filter(col("iid") =!= 999L)
    def leftJoin(iv: DataFrame): List[(Long, Option[Long])] =
      pts.join(iv, col("x") >= col("lo") && col("x") <= col("hi"), "left")
        .select("pid", "iid").as[(Long, Option[Long])]
        .collect().toList.sortBy(r => (r._1, r._2))
    val want = leftJoin(ivs)
    val want2 = leftJoin(noSpan)
    withRule(7L) {
      val df = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"), "left")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
      assert(leftJoin(ivs) == want)
      val got2 = leftJoin(noSpan)
      assert(got2 == want2)
      assert(got2.exists(_._2.isEmpty)) // unmatched rows present
    }
  }

  test("RIGHT OUTER with points on the right rewrites symmetrically") {
    val pts = ((0L until 80L).map(i => (i, i * 3 - 100)) ++
      Seq((900L, 500000L))).toDF("pid", "x")
    val noSpan = ivs.filter(col("iid") =!= 999L)
    val want = noSpan.join(pts,
        col("x") >= col("lo") && col("x") <= col("hi"), "right")
      .select("pid", "iid").as[(Long, Option[Long])]
      .collect().toList.sortBy(r => (r._1, r._2))
    withRule(7L) {
      val df = noSpan.join(pts,
        col("x") >= col("lo") && col("x") <= col("hi"), "right")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      val got = df.select("pid", "iid").as[(Long, Option[Long])]
        .collect().toList.sortBy(r => (r._1, r._2))
      assert(got == want)
      assert(got.exists(_._2.isEmpty))
    }
  }

  test("FULL OUTER BETWEEN join rewrites: exact multiset vs the naive " +
      "plan, both complements populated, no nested loop") {
    val pts = ((0L until 80L).map(i => (i, i * 3 - 100)) ++
      Seq((900L, 500000L), (901L, -500000L))).toDF("pid", "x")
    // noSpan plus an interval covering no point and an INVERTED interval
    // (matches nothing; full-outer must surface it null-extended)
    val iv = ivs.filter(col("iid") =!= 999L)
      .unionAll(Seq((998L, 700000L, 700010L), (997L, 100L, -100L))
        .toDF("iid", "lo", "hi"))
    def fullJoin(): List[(Option[Long], Option[Long])] =
      pts.join(iv, col("x") >= col("lo") && col("x") <= col("hi"), "full")
        .select("pid", "iid").as[(Option[Long], Option[Long])]
        .collect().toList.sortBy(r => (r._1, r._2))
    val want = fullJoin()
    withRule(7L) {
      val df = pts.join(iv,
        col("x") >= col("lo") && col("x") <= col("hi"), "full")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
      val got = fullJoin()
      assert(got == want)
      assert(got.exists(_._2.isEmpty)) // unmatched points present
      assert(got.exists(_._1.isEmpty)) // unmatched intervals present
      assert(got.contains((None: Option[Long], Some(997L)))) // inverted
    }
  }

  test("LEFT OUTER with the preserved side as INTERVALS is left alone " +
      "(only points-preserving orientations rewrite)") {
    withRule(7L) {
      val p = ivs.join(points,
          col("x") >= col("lo") && col("x") <= col("hi"), "left")
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__gkey"), p.take(3000))
    }
  }

  test("x103 plan pin: the naive TIMESTAMP BETWEEN SQL join plans as a " +
      "hash equi-join under binSize=auto, and the derived width is " +
      "observable") {
    val (child, joined) = graft.QueriesExt.rangeJoinTimeFrame(spark, sfDir)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // ±2h windows: every span is exactly 4h of micros, so p75 == 4h —
    // read through the per-thread attribution (the plan above was forced
    // on this thread)
    assert(RangeJoinRewrite.lastDerivedWidth
      .contains(4L * 3600L * 1000000L))
    // and the parent session carries none of the child's optimizer state
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[RangeJoinRewrite]))
    assert(spark.conf.get("spark.graft.rangeJoin.binSize", "unset")
      == "unset")
  }

  test("x104 plan pin: the naive LEFT JOIN BETWEEN SQL (sparse purchase " +
      "windows) plans without a nested loop") {
    // the SAME frame the shipped query aggregates (shared helper), so
    // this pin can never drift from the query's actual shape
    val (_, df) = graft.QueriesExt.rangeJoinLeftOuterFrame(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__gk") || df.queryExecution.optimizedPlan
      .toString.contains("__gkey"), p.take(3000))
  }

  test("x110 plan pin: the naive FULL JOIN BETWEEN SQL (sparse purchase " +
      "windows) plans without a nested loop") {
    val (_, df) = graft.QueriesExt.rangeJoinFullOuterFrame(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__gk") || df.queryExecution.optimizedPlan
      .toString.contains("__gkey"), p.take(3000))
  }

  test("x105 plan pin: the naive DATE BETWEEN SQL join (monthly windows)" +
      " plans as a hash equi-join; auto derives the 9-day width") {
    val child = spark.newSession()
    child.experimental.extraOptimizations =
      child.experimental.extraOptimizations :+ RangeJoinRewrite(child)
    child.conf.set("spark.graft.rangeJoin.binSize", "auto")
    child.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    graft.Tables.load(child, sfDir, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
      .createOrReplaceTempView("graft_x105p_orders")
    child.sql(
      """SELECT explode(sequence(DATE'1995-01-01', DATE'2001-08-01',
        |  interval 1 month)) AS ws""".stripMargin)
      .createOrReplaceTempView("graft_x105p_windows")
    val df = child.sql(
      """SELECT o.o_orderkey, w.ws FROM graft_x105p_orders o
        |JOIN graft_x105p_windows w
        |  ON o.od BETWEEN w.ws AND date_add(w.ws, 9)""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(RangeJoinRewrite.lastDerivedWidth.contains(9L))
  }

  // rule installed, binSize set, but the stats guard left at (or given)
  // a REAL threshold — the guard-behavior tests' counterpart to
  // withRuleConf, which zeroes it
  private def withGuardedRule[A](binSize: String,
      smallSide: Option[String] = None)(f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite(spark)
    spark.conf.set("spark.graft.rangeJoin.binSize", binSize)
    smallSide.foreach(v =>
      spark.conf.set("spark.graft.rangeJoin.smallSideBytes", v))
    try f finally {
      spark.experimental.extraOptimizations = prev
      spark.conf.unset("spark.graft.rangeJoin.binSize")
      spark.conf.unset("spark.graft.rangeJoin.smallSideBytes")
    }
  }

  test("DECIMAL axis: BETWEEN over decimal columns rewrites (buckets on " +
      "the unscaled cents view), exact multiset") {
    val dPoints = points.select(col("pid"),
      (col("x").cast("decimal(12,2)") / 4).cast("decimal(12,2)").as("dx"))
    val dIvs = ivs
      .filter(col("iid") =!= 999L) // keep spans in decimal(12,2) range
      .select(col("iid"),
        (col("lo").cast("decimal(12,2)") / 4).cast("decimal(12,2)")
          .as("dlo"),
        (col("hi").cast("decimal(12,2)") / 4).cast("decimal(12,2)")
          .as("dhi"))
    val want = dPoints.join(dIvs,
        col("dx") >= col("dlo") && col("dx") <= col("dhi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    withRule(175L) { // 1.75 in unscaled cents
      val df = dPoints.join(dIvs,
        col("dx") >= col("dlo") && col("dx") <= col("dhi"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"))
      assert(df.select("pid", "iid")
        .as[(Long, Long)].collect().toSeq.sorted == want)
    }
  }

  test("DECIMAL axis beyond precision 18 is left alone (no exact long " +
      "view)") {
    val dPoints = points.select(col("pid"),
      col("x").cast("decimal(20,2)").as("dx"))
    val dIvs = ivs.select(col("iid"),
      col("lo").cast("decimal(20,2)").as("dlo"),
      col("hi").cast("decimal(20,2)").as("dhi"))
    withRule(100L) {
      val p = dPoints.join(dIvs,
          col("dx") >= col("dlo") && col("dx") <= col("dhi"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__gkey"), p.take(3000))
    }
  }

  test("LEFT SEMI (EXISTS form) rewrites: exact set incl. duplicate and " +
      "NULL-axis points") {
    // duplicate point rows (same full tuple) must keep multiplicity;
    // a NULL-axis point can never be covered
    val pts = (points.unionAll(points.filter(col("pid") < 5L)))
      .unionAll(Seq((998L, Option.empty[Long])).toDF("pid", "x"))
    val want = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"), "left_semi")
      .select("pid").as[Long].collect().toSeq.sorted
    withRule(7L) {
      val df = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"), "left_semi")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"))
      val got = df.select("pid").as[Long].collect().toSeq.sorted
      assert(got == want)
      assert(!got.contains(998L)) // NULL axis: no covering interval
    }
  }

  test("LEFT ANTI (NOT EXISTS form) rewrites: exact set, NULL-axis " +
      "points KEPT") {
    val pts = (points.unionAll(points.filter(col("pid") < 5L)))
      .unionAll(Seq((998L, Option.empty[Long])).toDF("pid", "x"))
    val want = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"), "left_anti")
      .select("pid").as[Long].collect().toSeq.sorted
    withRule(7L) {
      val df = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"), "left_anti")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"))
      val got = df.select("pid").as[Long].collect().toSeq.sorted
      assert(got == want)
      assert(got.contains(998L)) // NOT EXISTS keeps the NULL-axis row
    }
  }

  test("SEMI/ANTI with the INTERVAL side preserved (points on the " +
      "right): 'intervals containing >= 1 point' rewrites via the " +
      "second orientation") {
    for (jt <- Seq("left_semi", "left_anti")) {
      val want = ivs.join(points,
          col("x") >= col("lo") && col("x") <= col("hi"), jt)
        .select("iid").as[Long].collect().toSeq.sorted
      withRule(7L) {
        val df = ivs.join(points,
          col("x") >= col("lo") && col("x") <= col("hi"), jt)
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$jt: ${p.take(3000)}")
        assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"),
          jt)
        assert(df.select("iid").as[Long].collect().toSeq.sorted == want, jt)
      }
    }
  }

  test("SEMI/ANTI over the interval-OVERLAP shape rewrite: exact sets, " +
      "inverted/spanning intervals handled, no nested loop") {
    val l = ((0L until 60L).map(i => (i, i * 5 - 50, i * 5 - 20)) ++
      Seq((500L, 40L, 10L), (999L, -1000000000000L, 1000000000000L)))
      .toDF("lid", "lst", "len")
    val r = ((0L until 60L).map(i => (i, i * 7 - 80, i * 7 - 30)) ++
      Seq((600L, 90L, 60L))).toDF("rid", "rst", "ren")
    val cond = col("lst") < col("ren") && col("rst") < col("len")
    for (jt <- Seq("left_semi", "left_anti")) {
      val want = l.join(r, cond, jt)
        .select("lid").as[Long].collect().toSeq.sorted
      withRule(25L) {
        val df = l.join(r, cond, jt)
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$jt: ${p.take(3000)}")
        assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"),
          jt)
        assert(df.select("lid").as[Long].collect().toSeq.sorted == want, jt)
      }
    }
  }

  test("LEFT/RIGHT/FULL OUTER over the interval-OVERLAP shape rewrite: " +
      "exact multisets, inverted/spanning intervals null-extend, no " +
      "nested loop") {
    val l = ((0L until 60L).map(i => (i, i * 5 - 50, i * 5 - 20)) ++
      Seq((500L, 40L, 10L), (999L, -1000000000000L, 1000000000000L)))
      .toDF("lid", "lst", "len")
    val r = ((0L until 60L).map(i => (i, i * 7 - 80, i * 7 - 30)) ++
      Seq((600L, 90L, 60L))).toDF("rid", "rst", "ren")
    val cond = col("lst") < col("ren") && col("rst") < col("len")
    for (jt <- Seq("left", "right", "full")) {
      val want = l.join(r, cond, jt).select("lid", "rid")
        .as[(Option[Long], Option[Long])].collect().toSeq
        .sortBy(p => (p._1, p._2))
      withRule(25L) {
        val df = l.join(r, cond, jt)
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$jt: ${p.take(3000)}")
        assert(df.queryExecution.optimizedPlan.toString.contains("__gkey"),
          jt)
        val got = df.select("lid", "rid")
          .as[(Option[Long], Option[Long])].collect().toSeq
          .sortBy(p => (p._1, p._2))
        // NOTE: unlike the point shape, an INVERTED interval can satisfy
        // the overlap shape's two independent inequalities — the planted
        // (40, 10) row legitimately matches — so the only correct pin is
        // full multiset equality with the naive outer join
        assert(got == want, jt)
      }
    }
  }

  test("x118 plan pin: the naive DECIMAL BETWEEN SQL join (price bands) " +
      "plans without a nested loop") {
    val (_, df) = graft.QueriesExt.rangeJoinDecimalFrame(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__gk") || df.queryExecution.optimizedPlan
      .toString.contains("__gkey"), p.take(3000))
  }

  test("x130 plan pin: the naive DECIMAL overlap RIGHT JOIN SQL (price " +
      "intervals vs bands) plans without a nested loop") {
    val (_, df) = graft.QueriesExt.rangeJoinDecimalOverlapFrame(spark,
      sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__gk") || df.queryExecution.optimizedPlan
      .toString.contains("__gkey"), p.take(3000))
  }

  test("x119/x120 plan pins: the naive EXISTS / NOT EXISTS interval SQL " +
      "plans without a nested loop") {
    for ((neg, tag) <- Seq((false, "x119"), (true, "x120"))) {
      val (_, df) = graft.QueriesExt.rangeJoinExistenceFrame(spark, sfDir,
        negated = neg, tag = tag + "p")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$tag: ${p.take(3000)}")
      assert(!p.contains("CartesianProduct"), s"$tag: ${p.take(3000)}")
      assert(p.contains("__gk") || df.queryExecution.optimizedPlan
        .toString.contains("__gkey"), s"$tag: ${p.take(3000)}")
    }
  }

  test("x125 plan pin: the naive NOT EXISTS overlap SQL (isolated " +
      "sessions) plans without a nested loop") {
    val (_, df) = graft.QueriesExt.rangeJoinAntiOverlapFrame(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("__gk") || df.queryExecution.optimizedPlan
      .toString.contains("__gkey"), p.take(3000))
  }

  test("stats guard: a broadcast-tiny interval side keeps Catalyst's " +
      "plan at the DEFAULT threshold; zeroing the guard re-enables " +
      "the rewrite") {
    // the 41-row fixture is the 80-row monthly-window counter-case in
    // miniature: BNLJ over a broadcast handful beats explodes + shuffle
    val want = naive
    withGuardedRule("7") {
      val df = points.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("__gkey"), p.take(3000))
      // declined != broken: the untouched plan is still exact
      assert(df.select("pid", "iid").as[(Long, Long)]
        .collect().toSeq.sorted == want)
    }
    withGuardedRule("7", smallSide = Some("0")) {
      val p = points.join(ivs,
          col("x") >= col("lo") && col("x") <= col("hi"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("__gkey"), p.take(3000))
    }
  }

  test("stats guard: a large interval side still rewrites at the " +
      "default threshold (only the POINTS side may be small)") {
    // Range(4000) estimates at 32 KB — over the 8 KB default
    val bigIvs = spark.range(4000L).select(col("id").as("iid"),
      (col("id") * 50L).as("lo"), (col("id") * 50L + 5L).as("hi"))
    withGuardedRule("32") {
      val df = points.join(bigIvs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("__gkey"), p.take(3000))
    }
  }

  test("stats guard: the overlap shape declines when EITHER side is " +
      "tiny (both sides replicate)") {
    val tinyL = Seq((1L, 0L, 100L), (2L, 200L, 300L))
      .toDF("lid", "lst", "len")
    val bigR = spark.range(4000L).select(col("id").as("rid"),
      (col("id") * 10L).as("rst"), (col("id") * 10L + 7L).as("ren"))
    def overlapPlan(): String = tinyL.join(bigR,
        col("lst") <= col("ren") && col("rst") <= col("len"))
      .queryExecution.optimizedPlan.toString
    withGuardedRule("16") {
      assert(!overlapPlan().contains("__gkey"))
    }
    withGuardedRule("16", smallSide = Some("0")) {
      assert(overlapPlan().contains("__gkey"))
    }
  }

  test("joins with an equi key are left alone; rule off without the conf") {
    // equi conjunct present -> Catalyst hash-joins on it already
    val withKey = points.withColumn("k", col("pid") % 3)
    val ivKey = ivs.withColumn("k", col("iid") % 3)
    withRule(7L) {
      val p = withKey.join(ivKey,
          Seq("k").map(k => withKey(k) === ivKey(k)).reduce(_ && _) &&
            col("x") >= col("lo") && col("x") <= col("hi"))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("__gkey"), p.take(3000))
    }
    // conf unset -> naive plan untouched
    val p2 = points.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .queryExecution.optimizedPlan.toString
    assert(!p2.contains("__gkey"), p2.take(3000))
  }

  test("concurrent auto derivations attribute per thread and per shape " +
      "— the retired session-conf echo's clobber scenario") {
    // ONE session, two queries with different interval shapes, planned
    // on two threads at once: each thread must read its OWN derived
    // width, and the shape-keyed registry must hold both
    val ivs17 = (0L until 40L).map(i => (i, i * 40, i * 40 + 17))
      .toDF("iid", "lo", "hi")
    val ivs23 = (0L until 40L).map(i => (i, i * 40, i * 40 + 23))
      .toDF("iid", "lo", "hi")
    withRuleConf("auto") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val gate = new java.util.concurrent.CountDownLatch(2)
      try {
        def derive(iv: org.apache.spark.sql.DataFrame)
            : java.util.concurrent.Future[Option[Long]] =
          pool.submit(new java.util.concurrent.Callable[Option[Long]] {
            override def call(): Option[Long] = {
              gate.countDown(); gate.await() // both threads plan together
              val df = points.join(iv,
                col("x") >= col("lo") && col("x") <= col("hi"))
              df.queryExecution.executedPlan // forces optimization HERE
              RangeJoinRewrite.lastDerivedWidth
            }
          })
        val (w17, w23) = (derive(ivs17), derive(ivs23))
        assert(w17.get().contains(17L))
        assert(w23.get().contains(23L))
        assert(Set(17L, 23L).subsetOf(
          RangeJoinRewrite.derivedWidths.values.toSet))
      } finally pool.shutdown()
    }
  }
}
