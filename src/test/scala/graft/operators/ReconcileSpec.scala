package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reconciliation must classify keys exactly (only-in-A / only-in-B /
  * both), count per-column diffs null-safely, and the checksum tier must
  * be order-independent and match hand-computed encodings.
  */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diffSummary: hand-checked keyed diff with null-safe column " +
      "comparison (null vs value differs, null vs null does not)") {
    val a = Seq(
      (1L, Some("x"), Some(1.0)),
      (2L, Some("y"), None),
      (3L, None, Some(3.0)),
      (4L, Some("gone"), Some(4.0)))
      .toDF("k", "s", "d")
    val b = Seq(
      (1L, Some("x"), Some(1.0)),     // identical
      (2L, Some("y2"), None),          // s differs, d null==null
      (3L, None, Some(9.0)),           // d differs, s null==null
      (5L, Some("new"), Some(5.0)))    // only in b
      .toDF("k", "s", "d")
    val got = Reconcile.diffSummary(a, b, Seq("k"))
      .orderBy("metric").as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("diff:d", 1L), ("diff:s", 1L),
      ("in_both", 3L), ("only_in_a", 1L), ("only_in_b", 1L)))
  }

  test("diffSummary of a frame against itself is all-zero diffs") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val got = Reconcile.diffSummary(o, o, Seq("o_orderkey"))
      .as[(String, Long)].collect().toMap
    val n = o.count()
    assert(got("only_in_a") == 0L && got("only_in_b") == 0L)
    assert(got("in_both") == n)
    got.collect { case (m, c) if m.startsWith("diff:") =>
      assert(c == 0L, m)
    }
  }

  test("diffSummary refuses mismatched schemas and empty keys") {
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Reconcile.diffSummary(a, a.withColumnRenamed("s", "t"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.diffSummary(a, a, Nil)
    }
  }

  test("diffSummary plans ONE hash/merge full-outer join — no nested " +
      "loop, no cartesian") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val p = Reconcile.diffSummary(a, a, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert("FullOuter".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("columnChecksums: hand-computed encodings per type, nulls " +
      "skipped but counted out of n_nonnull") {
    val df = Seq(
      (7L, Some("ab"), Some(2.5),
        Some(Timestamp.valueOf("1970-01-01 00:00:01"))),
      (1000010L, None, None, None))
      .toDF("i", "s", "d", "ts")
    val got = Reconcile.columnChecksums(df, Seq("i", "s", "d", "ts"))
      .orderBy("col_name").as[(String, Long, Long)].collect().toSeq
    // i: 7 + (1000010 % 1000003 = 7) = 14
    // s: fold("ab") = (0*31+97=97)*31 + 98 = 3105
    // d: 2.50 -> 250 cents
    // ts: 1s -> 1000000 micros
    assert(got == Seq(
      ("d", 1L, 250L), ("i", 2L, 14L), ("s", 1L, 3105L),
      ("ts", 1L, 1000000L)))
  }

  test("columnChecksums is order- and partitioning-independent (a " +
      "multiset fingerprint)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_returnflag", "l_quantity")
    val base = Reconcile.columnChecksums(li, cols)
      .orderBy("col_name").collect().toSeq
    val scrambled = Reconcile.columnChecksums(
      li.repartition(7, col("l_partkey")).sortWithinPartitions("l_suppkey"),
      cols).orderBy("col_name").collect().toSeq
    assert(scrambled == base)
  }

  test("groupedColumnChecksums: per-group rows whose sums reconcile " +
      "with the whole-table checksums (localization is lossless)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_quantity")
    val grouped = Reconcile.groupedColumnChecksums(li, "l_returnflag", cols)
    val rolled = grouped.groupBy("col_name")
      .agg(sum("n_nonnull").as("n"), sum("checksum").as("ck"))
      .orderBy("col_name")
      .as[(String, Long, Long)].collect().toSeq
    val whole = Reconcile.columnChecksums(li, cols)
      .orderBy("col_name").as[(String, Long, Long)].collect().toSeq
    assert(rolled == whole)
    intercept[IllegalArgumentException] {
      Reconcile.groupedColumnChecksums(li, "l_quantity", cols)
    }
  }

  test("columnChecksums encodes negative values with pmod (always " +
      "non-negative) — the canonical form SQL replays must match with " +
      "((e % M) + M) % M") {
    val df = Seq((-5L, Some(-50.0)), (5L, Some(50.0))).toDF("i", "d")
    val got = Reconcile.columnChecksums(df, Seq("i", "d"))
      .orderBy("col_name").as[(String, Long, Long)].collect().toSeq
    // i: pmod(-5) = 1000003 - 5 = 999998; + 5 -> 1000003
    // d: cents -5000 -> pmod = 995003; + 5000 -> 1000003
    assert(got == Seq(("d", 2L, 1000003L), ("i", 2L, 1000003L)))
  }

  test("groupedColumnChecksums tolerates keyword/spaced group-column " +
      "names (Column-API projection, never the SQL parser)") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("i", "order by")
    val got = Reconcile.groupedColumnChecksums(df, "order by", Seq("i"))
      .orderBy("order by").as[(String, String, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("a", "i", 2L, 3L), ("b", "i", 1L, 3L)))
  }

  test("columnChecksums refuses unsupported column types (maps, nested " +
      "arrays)") {
    val df = Seq((1L, Map("a" -> 1))).toDF("k", "m")
    intercept[IllegalArgumentException] {
      Reconcile.columnChecksums(df, Seq("m")).collect()
    }
    val nested = Seq((1L, Seq(Seq(1, 2)))).toDF("k", "aa")
    intercept[IllegalArgumentException] {
      Reconcile.columnChecksums(nested, Seq("aa")).collect()
    }
  }

  test("array checksums: hand-computed order-dependent fold; null " +
      "elements fold as the M sentinel; empty vs NULL arrays differ") {
    val M = 1000003L
    val df = Seq(
      (1L, Some(Seq(Some(2L), Some(3L)))),
      (2L, Some(Seq(Some(3L), Some(2L)))), // reversed: different fold
      (3L, Some(Seq(Option.empty[Long]))), // null ELEMENT -> sentinel M
      (4L, Some(Seq.empty[Option[Long]])), // empty -> 0, still counted
      (5L, Option.empty[Seq[Option[Long]]])) // NULL array -> skipped
      .toDF("k", "arr")
    val got = Reconcile.columnChecksums(df, Seq("arr"))
      .as[(String, Long, Long)].collect().head
    // fold from init 1: ((1*31 + e1)*31 + e2) % M per step
    val f12 = ((1L * 31 + 2) * 31 + 3) % M
    val f21 = ((1L * 31 + 3) * 31 + 2) % M
    val fNull = (1L * 31 + M) % M // sentinel slot: 31, not the empty 1
    val fEmpty = 1L
    assert(got == (("arr", 4L, f12 + f21 + fNull + fEmpty)))
    // order dependence is real, and [null] never collides with []
    assert(f12 != f21 && fNull != fEmpty)
  }

  test("float-array checksums canonicalize elements at 6dp micro-units " +
      "(vector components live near zero)") {
    val M = 1000003L
    val df = Seq((1L, Seq(0.5f, -0.000001f))).toDF("k", "emb")
    val got = Reconcile.columnChecksums(df, Seq("emb"))
      .as[(String, Long, Long)].collect().head
    val e1 = 500000L % M
    val e2 = ((-1L % M) + M) % M // pmod: negatives map non-negative
    assert(got == (("emb", 1L, (((1L * 31 + e1) % M) * 31 + e2) % M)))
  }

  test("diffExamples: up to maxPerCol per differing column, smallest " +
      "rendered key first, profiler renderings, null-vs-value counted") {
    val a = Seq((1L, Some("x"), Some(2.5)), (2L, Some("y"), Some(1.0)),
      (3L, Some("z"), None), (4L, Some("w"), Some(4.0)),
      (5L, Some("v"), Some(5.0))).toDF("k", "s", "d")
    val b = Seq((1L, Some("x"), Some(2.5)), // identical -> no example
      (2L, Some("Y"), Some(1.0)),           // s differs
      (3L, Some("z"), Some(9.0)),           // d: null vs value differs
      (4L, Some("w"), Some(4.5)),           // d differs
      (5L, Some("V"), Some(5.5)),           // both differ
      (6L, Some("q"), Some(0.0)))           // only-in-b -> no example
      .toDF("k", "s", "d")
    val got = Reconcile.diffExamples(a, b, Seq("k"), maxPerCol = 2)
      .orderBy("col_name", "key_s")
      .as[(String, String, Option[String], Option[String])]
      .collect().toSeq
    // d: keys 3,4,5 differ; top-2 by key string -> 3,4. s: 2,5 -> both.
    // membership: key 6 exists only in b (values null — the row itself
    // is the difference)
    assert(got == Seq(
      ("d", "3", None, Some("9.00")),
      ("d", "4", Some("4.00"), Some("4.50")),
      ("only_in_b", "6", None, None),
      ("s", "2", Some("y"), Some("Y")),
      ("s", "5", Some("v"), Some("V"))))
  }

  test("diffExamples of identical frames is empty; schema/key guards " +
      "match diffSummary's; key-only frames yield membership examples") {
    val a = Seq((1L, "x")).toDF("k", "s")
    assert(Reconcile.diffExamples(a, a, Seq("k")).count() == 0L)
    intercept[IllegalArgumentException] {
      Reconcile.diffExamples(a, a.withColumnRenamed("s", "t"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.diffExamples(a, a, Nil)
    }
    // a payload column named like a membership metric would share its
    // top-N window partition with the metric's examples — refused
    val hom = Seq((1L, "x")).toDF("k", "only_in_a")
    intercept[IllegalArgumentException] {
      Reconcile.diffExamples(hom, hom, Seq("k"))
    }
    // key-only frames: only the membership metrics can differ — and do
    val ka = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val kb = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = Reconcile.diffExamples(ka, kb, Seq("k"))
      .orderBy("col_name")
      .as[(String, String, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(("only_in_a", "1", None, None),
      ("only_in_b", "3", None, None)))
  }

  test("diffExamples plans a WindowGroupLimit pre-limit (per-partition " +
      "top-N before the single window exchange)") {
    val a = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "d")
    val b = Seq((1L, 1.5), (2L, 2.5)).toDF("k", "d")
    val p = Reconcile.diffExamples(a, b, Seq("k"), maxPerCol = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("fractionals beyond the DECIMAL(18,2) range raise LOUDLY in " +
      "non-ANSI sessions too (never a silently dropped NULL)") {
    // ANSI-off is exactly where the bare cast would turn an overflow
    // into NULL and sum() would silently drop it while n_nonnull still
    // counted it — a corrupted fingerprint with no error
    val child = spark.newSession()
    child.conf.set("spark.sql.ansi.enabled", "false")
    import child.implicits._
    val bad = Seq(1.0e17, 2.5).toDF("d")
    val e = intercept[Exception] {
      Reconcile.columnChecksums(bad, Seq("d")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("canonicalization")), e.toString)
    // NaN/Infinity have no canonical cents encoding: raise, both modes
    val nan = Seq(Double.NaN).toDF("d")
    assert(msgs(intercept[Exception] {
      Reconcile.columnChecksums(nan, Seq("d")).collect()
    }).exists(_.contains("canonicalization")))
    // in-range values keep working under ANSI-off, same fingerprints
    val ok = Seq(2.5, -1.25).toDF("d")
    val gotOff = Reconcile.columnChecksums(ok, Seq("d")).collect().toSeq
    val okOn = Seq(2.5, -1.25).toDF("d")
    assert(Reconcile.columnChecksums(okOn, Seq("d"))
      .collect().toSeq == gotOff)
  }

  test("string checksums: the native code-point fold matches the HOF " +
      "substr/ascii form, including supplementary-plane text") {
    // 'a'=97; "𝄞" (U+1D11E, astral) folds as ONE code point: both the
    // engine and DuckDB index strings by code point, so the kernel must
    // too (not UTF-16 units 0xD834/0xDD1E)
    val df = Seq(Some("ab"), Some("𝄞a"), Some(""), None).toDF("s")
    val got = Reconcile.columnChecksums(df, Seq("s"))
      .as[(String, Long, Long)].collect().head
    val foldAb = (97L * 31 + 98) % 1000003L
    val foldAstral = ((0x1D11E.toLong % 1000003L) * 31 + 97) % 1000003L
    // the checksum is the plain SUM of per-value folds (no outer mod)
    assert(got == (("s", 3L, foldAb + foldAstral + 0L)))
    // HOF replica over the same frame agrees (the legacy encoding)
    val hof = df.select(sum(aggregate(
      transform(sequence(lit(1), length(col("s"))),
        i => ascii(col("s").substr(i, lit(1))).cast("long")),
      lit(0L), (acc, cp) => pmod(acc * lit(31L) + cp, lit(1000003L))))
      .as("ck")).head().getLong(0)
    assert(hof == got._3)
  }

  test("reconcile refuses a key column named after an internal " +
      "presence marker (it would silently corrupt the keyed diff)") {
    val df = Seq((1, "x")).toDF("__pa", "v")
    intercept[IllegalArgumentException] {
      Reconcile.diffSummary(df, df, Seq("__pa"))
    }
    val df2 = Seq((1, "x")).toDF("__pb", "v")
    intercept[IllegalArgumentException] {
      Reconcile.diffExamples(df2, df2, Seq("__pb"))
    }
  }
}
