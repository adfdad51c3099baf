package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-pass profiler must report exact per-column stats (nulls,
  * cardinality, rendered min/max) from a single aggregation, and the
  * approximate variant must keep the identical shape while trading the
  * distinct expansion for HLL sketches.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(2.5), Some(Timestamp.valueOf("2024-01-01 10:00:00"))),
    (2L, Some("b"), Some(1.0), None),
    (3L, None, Some(2.5), Some(Timestamp.valueOf("2024-03-05 23:59:59"))),
    (3L, Some("a"), None, Some(Timestamp.valueOf("2024-01-01 10:00:00"))))
    .toDF("id", "s", "d", "ts")

  test("exact profile: one row per column with hand-checked stats and " +
      "per-type min/max renderings") {
    val got = Profile.columnProfile(fixture, Seq("id", "s", "d", "ts"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("d", 4L, 3L, 2L, "1.00", "2.50"),
      ("id", 4L, 4L, 3L, "1", "3"),
      ("s", 4L, 3L, 2L, "a", "b"),
      ("ts", 4L, 3L, 2L,
        "2024-01-01 10:00:00", "2024-03-05 23:59:59")))
  }

  test("exact profile runs as ONE aggregation: a single Expand carries " +
      "every distinct column; no per-column jobs or extra scans") {
    val df = Profile.columnProfile(fixture, Seq("id", "s", "d", "ts"))
    val p = df.queryExecution.executedPlan.toString
    assert("(?s)Expand".r.findAllIn(p).size == 1, p.take(3000))
    // one source: the fixture appears once in the plan (no union of
    // per-column subplans, no repeated scan)
    assert("LocalTableScan".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("approx profile: same shape, no Expand, HLL cardinalities close " +
      "to exact (exact-below-sketch-width here) and all other stats " +
      "identical") {
    val exact = Profile.columnProfile(fixture, Seq("id", "s", "d", "ts"))
    val approx = Profile.approxColumnProfile(fixture,
      Seq("id", "s", "d", "ts"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val e = exact.orderBy("col_name").collect().toSeq
    val a = approx.orderBy("col_name").collect().toSeq
    // tiny cardinalities sit in HLL's exact range, so full equality holds
    assert(a == e)
  }

  test("unified entries default to the sketch forms (no Expand, " +
      "fixed-memory percentile); the exact paths are opt-in") {
    // profile(): default == approx (HLL, no Expand anywhere in the plan)
    val dflt = Profile.profile(fixture, Seq("id", "s", "d", "ts"))
    assert(!dflt.queryExecution.executedPlan.toString.contains("Expand"))
    assert(dflt.orderBy("col_name").collect().toSeq ==
      Profile.approxColumnProfile(fixture, Seq("id", "s", "d", "ts"))
        .orderBy("col_name").collect().toSeq)
    // exact = true == the Expand-planned exact form
    val ex = Profile.profile(fixture, Seq("id", "s", "d", "ts"),
      exact = true)
    assert(ex.queryExecution.executedPlan.toString.contains("Expand"))
    assert(ex.orderBy("col_name").collect().toSeq ==
      Profile.columnProfile(fixture, Seq("id", "s", "d", "ts"))
        .orderBy("col_name").collect().toSeq)
    // profileQuantiles(): default == approx_percentile, exact opt-in
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val qd = Profile.profileQuantiles(df, Seq("v"))
    assert(qd.queryExecution.analyzed.toString
      .contains("approx_percentile"), qd.queryExecution.analyzed.toString)
    val qe = Profile.profileQuantiles(df, Seq("v"), exact = true)
    assert(!qe.queryExecution.analyzed.toString.contains("approx"))
    assert(qe.collect().toSeq ==
      Profile.quantileProfile(df, Seq("v")).collect().toSeq)
  }

  test("grouped profile: one row per (group, column) with hand-checked " +
      "stats, still a single-Expand single-scan plan") {
    val df = Seq(
      ("web", 1L, Some("en")), ("web", 2L, Some("en")),
      ("web", 2L, None),
      ("pdf", 5L, Some("de")))
      .toDF("src", "id", "lang")
    val prof = Profile.groupedColumnProfile(df, "src", Seq("id", "lang"))
    val got = prof.orderBy("src", "col_name")
      .as[(String, String, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("pdf", "id", 1L, 1L, 1L, "5", "5"),
      ("pdf", "lang", 1L, 1L, 1L, "de", "de"),
      ("web", "id", 3L, 3L, 2L, "1", "2"),
      ("web", "lang", 3L, 2L, 1L, "en", "en")))
    val p = prof.queryExecution.executedPlan.toString
    assert("(?s)Expand".r.findAllIn(p).size == 1, p.take(3000))
    assert("LocalTableScan".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("profileGrouped defaults to HLL (no Expand), exact opt-in equals " +
      "groupedColumnProfile") {
    val dflt = Profile.profileGrouped(fixture, "s", Seq("id", "d"))
    assert(!dflt.queryExecution.executedPlan.toString.contains("Expand"))
    val ex = Profile.profileGrouped(fixture, "s", Seq("id", "d"),
      exact = true)
    assert(ex.orderBy("s", "col_name").collect().toSeq ==
      Profile.groupedColumnProfile(fixture, "s", Seq("id", "d"))
        .orderBy("s", "col_name").collect().toSeq)
  }

  test("grouped profile refuses profiling the group column itself") {
    intercept[IllegalArgumentException] {
      Profile.groupedColumnProfile(fixture, "id", Seq("id", "s"))
    }
  }

  test("quantile profile: hand-checked interpolated cuts in tidy " +
      "(col_name, p, value) rows from one scan") {
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0).toDF("v")
      .withColumn("w", col("v") * 10)
    val prof = Profile.quantileProfile(df, Seq("v", "w"))
    val got = prof.orderBy("col_name", "p")
      .as[(String, Double, Double)].collect().toSeq
    // rank = p*(n-1) over sorted values, linear interpolation
    assert(got == Seq(
      ("v", 0.25, 1.0), ("v", 0.5, 2.0), ("v", 0.75, 3.0),
      ("v", 0.95, 3.8),
      ("w", 0.25, 10.0), ("w", 0.5, 20.0), ("w", 0.75, 30.0),
      ("w", 0.95, 38.0)))
    assert("LocalTableScan".r
      .findAllIn(prof.queryExecution.executedPlan.toString).size == 1)
  }

  test("approx quantile profile: identical shape, sketch values within " +
      "rank tolerance of exact") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val exact = Profile.quantileProfile(df, Seq("v"))
      .orderBy("p").as[(String, Double, Double)].collect()
    val approx = Profile.approxQuantileProfile(df, Seq("v"))
      .orderBy("p").as[(String, Double, Double)].collect()
    assert(approx.map(r => (r._1, r._2)).toSeq ==
      exact.map(r => (r._1, r._2)).toSeq)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e._3 - a._3) <= 2.0, s"$e vs $a")
    }
  }

  test("grouped quantile profile: per-(group, column, p) rows; exact " +
      "matches a per-group quantileProfile; default is the sketch form") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val got = Profile.groupedQuantileProfile(df, "g", Seq("v"),
        ps = Seq(0.5), exact = true)
      .orderBy("g").as[(String, String, Double, Double)].collect().toSeq
    // a: median of 1..4 = 2.5; b: median of {10,20} = 15
    assert(got == Seq(("a", "v", 0.5, 2.5), ("b", "v", 0.5, 15.0)))
    // per-group exact == ungrouped exact on each slice
    val aOnly = Profile.quantileProfile(df.filter($"g" === "a"),
      Seq("v"), Seq(0.5)).collect().head.getDouble(2)
    assert(aOnly == 2.5)
    // default path is the sketch aggregate
    val dflt = Profile.groupedQuantileProfile(df, "g", Seq("v"))
    assert(dflt.queryExecution.analyzed.toString
      .contains("approx_percentile"))
    intercept[IllegalArgumentException] {
      Profile.groupedQuantileProfile(df, "g", Seq("g", "v"))
    }
  }

  test("quantile profile refuses percentiles outside [0,1]") {
    intercept[IllegalArgumentException] {
      Profile.quantileProfile(fixture, Seq("d"), Seq(1.5))
    }
  }

  test("histogram drift: hand-checked bins, fractions, and L1 on a " +
      "planted shift; max value clamps into the last bin; nulls drop") {
    // A: values 0..3 (one per bin at nBins=4 over [0,4]); B: all 4s
    // (global max -> clamped to bin 3) plus a null that must not count
    val a = Seq(0.0, 1.0, 2.0, 3.0).map(Option(_)).toDF("v")
    val b = (Seq.fill(4)(Option(4.0)) :+ (None: Option[Double])).toDF("v")
    val got = Profile.histogramDrift(a, b, "v", 4).orderBy("bin")
      .as[(Int, Double, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      (0, 0.0, 1L, 0L, 0.25, 0.0, 0.25),
      (1, 1.0, 1L, 0L, 0.25, 0.0, 0.25),
      (2, 2.0, 1L, 0L, 0.25, 0.0, 0.25),
      (3, 3.0, 1L, 4L, 0.25, 1.0, 0.75)))
  }

  test("histogram drift with pinned bounds skips the min/max scan and " +
      "bins identically to the derived-bounds run") {
    val a = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 4.0).toDF("v")
    val derived = Profile.histogramDrift(a, b, "v", 4)
      .orderBy("bin").collect().toSeq
    val pinned = Profile.histogramDrift(a, b, "v", 4, Some((0.0, 4.0)))
      .orderBy("bin").collect().toSeq
    assert(pinned == derived)
  }

  test("histogram drift refuses a degenerate value range") {
    val a = Seq(2.0, 2.0).toDF("v")
    intercept[IllegalArgumentException] {
      Profile.histogramDrift(a, a, "v", 4)
    }
  }

  test("histogram drift with pinned bounds clamps out-of-domain values " +
      "into BOTH edge bins (no bin ids outside 0..nBins-1)") {
    val a = Seq(-5.0, 0.5, 9.0).toDF("v") // below lo AND above hi
    val b = Seq(1.5, 2.5).toDF("v")
    val got = Profile.histogramDrift(a, b, "v", 4, Some((0.0, 4.0)))
      .orderBy("bin")
      .as[(Int, Double, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(_._1) == Seq(0, 1, 2, 3))
    assert(got.head._3 == 2L)  // -5.0 clamped down into bin 0 with 0.5
    assert(got.last._3 == 1L)  // 9.0 clamped up into bin 3
  }

  test("histogram drift on empty/all-null inputs fails with the " +
      "designed message, not an NPE") {
    val empty = Seq.empty[Option[Double]].toDF("v")
    val e = intercept[IllegalArgumentException] {
      Profile.histogramDrift(empty, empty, "v", 4)
    }
    assert(e.getMessage.contains("no non-null values"))
  }

  test("iqrOutliers: hand-checked fences and outlier counts per group; " +
      "fences broadcast back (no second wide shuffle)") {
    // group g: values 0..8 plus planted outliers -100 and 100
    // q1 = 2, q3 = 6 over the 11 sorted values? compute by rank:
    // sorted: -100,0,1,2,3,4,5,6,7,8,100 (n=11); rank q1 = .25*10 = 2.5
    // -> 1 + (2-1)*.5 = 1.5; q3 rank 7.5 -> 6 + (7-6)*.5 = 6.5
    // IQR = 5 -> fences [-6, 14] -> outliers: -100, 100
    val df = ((0 to 8).map(v => ("g", v.toDouble)) ++
      Seq(("g", -100.0), ("g", 100.0), ("h", 1.0), ("h", 2.0)))
      .toDF("grp", "v")
    val got = Profile.iqrOutliers(df, "grp", "v")
      .orderBy("grp")
      .as[(String, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq
    assert(got.head == (("g", 1.5, 6.5, -6.0, 14.0, 11L, 2L)), got.head)
    assert(got(1)._7 == 0L) // tiny group h: no outliers
    val p = Profile.iqrOutliers(df, "grp", "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("iqrOutliers reports the NULL group (a broken feed's group key " +
      "is often exactly what's null) instead of dropping its rows") {
    val df = (Seq((Some("g"), 1.0), (Some("g"), 2.0), (Some("g"), 3.0)) ++
      Seq((None, 1.0), (None, 2.0), (None, 3.0), (None, 500.0)))
      .toDF("grp", "v")
    val got = Profile.iqrOutliers(df, "grp", "v")
      .as[(Option[String], Double, Double, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> (r._6, r._7)).toMap
    assert(got.contains(None), got)
    assert(got(None)._1 == 4L)      // all four null-group rows counted
    assert(got(None)._2 == 1L)      // the planted 500.0 outlier
    assert(got(Some("g")) == ((3L, 0L)))
  }

  test("profiling a parquet table reads ONLY the profiled columns " +
      "(column pruning reaches the scan)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = Profile.columnProfile(li, Seq("l_returnflag", "l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("l_returnflag") && scan.contains("l_quantity"))
    assert(!scan.contains("l_orderkey") && !scan.contains("l_comment"),
      scan)
    // and the stats agree with directly-computed ones
    val got = df.where(col("col_name") === "l_quantity")
      .select("n_distinct").as[Long].head()
    val want = li.select(countDistinct(col("l_quantity"))).as[Long].head()
    assert(got == want)
  }

  test("quantile profile REPORTS an all-null column as null cuts " +
      "instead of silently omitting it (exact and sketch paths)") {
    val df = Seq((1.0, Option.empty[Double]), (2.0, None), (3.0, None))
      .toDF("v", "dead")
    for (exact <- Seq(true, false)) {
      val got = Profile.profileQuantiles(df, Seq("v", "dead"),
          ps = Seq(0.5), exact = exact)
        .orderBy("col_name")
        .as[(String, Double, Option[Double])].collect().toSeq
      // the broken column must APPEAR, with a null value per percentile
      assert(got.map(_._1) == Seq("dead", "v"), s"exact=$exact: $got")
      assert(got.head._3.isEmpty, s"exact=$exact: $got")
      assert(got.last._3.contains(2.0), s"exact=$exact: $got")
    }
    // grouped form: the all-null column reports per group too
    val g = Seq(("a", Option.empty[Double]), ("b", None)).toDF("g", "dead")
    val gq = Profile.groupedQuantileProfile(g, "g", Seq("dead"),
        ps = Seq(0.5))
      .as[(String, String, Double, Option[Double])].collect().toSeq
    assert(gq.map(_._1).sorted == Seq("a", "b"), gq)
    assert(gq.forall(_._4.isEmpty), gq)
  }

  test("histogram drift excludes NaN like null: derived bounds stay " +
      "finite and NaN rows are not miscounted into bin 0") {
    val a = Seq(0.0, 1.0, 2.0, 3.0, Double.NaN).toDF("v")
    val b = Seq(Double.NaN, 4.0, 4.0).toDF("v")
    val got = Profile.histogramDrift(a, b, "v", 4).orderBy("bin")
      .as[(Int, Double, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // identical to the NaN-free run: 4 clean rows in a, 2 in b
    assert(got.map(r => (r._1, r._3, r._4)) == Seq(
      (0, 1L, 0L), (1, 1L, 0L), (2, 1L, 0L), (3, 1L, 2L)), got)
    // and fractions are over the CLEAN counts only
    assert(got.head._5 == 0.25 && got.last._6 == 1.0, got)
  }
}
