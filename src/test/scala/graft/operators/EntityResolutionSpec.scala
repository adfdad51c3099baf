package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EntityResolution]] — multi-pass blocked fuzzy matching. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("blocked matches equal the brute-force cross join for the x74 " +
      "key set (lossless-blocking law)") {
    // 60 fixed-format names + hand-planted variants; the three passes
    // (prefix-16, suffix-3, skip-16) leave every char position outside
    // at least one key, so substitution-distance-1 recall is total
    val rows = (0L until 60L).map(i => (i, f"Customer#$i%09d"))
    val df = rows.toDF("c_custkey", "c_name")
    val keys = Seq(
      substring(col("c_name"), 1, 16),
      substring(col("c_name"), -3, 3),
      concat(substring(col("c_name"), 1, 15),
        substring(col("c_name"), 17, 2)))
    val blocked = EntityResolution.fuzzyMatches(
      df, "c_name", "c_custkey", keys, maxDistance = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter($"a.c_custkey" < $"b.c_custkey" &&
        levenshtein($"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey", $"b.c_custkey").as[(Long, Long)]
      .collect().toSet
    assert(blocked === brute)
    assert(brute.nonEmpty)
  }

  test("single-pass blocking misses the matches that differ inside its " +
      "key; adding the complementary pass recovers them") {
    // two names differing at char 10 (the first digit): same suffix,
    // different prefix — a prefix-only pass cannot block them together
    val df = Seq(
      (1L, "Customer#000000007"),
      (2L, "Customer#100000007")).toDF("c_custkey", "c_name")
    val prefixOnly = EntityResolution.fuzzyMatches(df, "c_name",
      "c_custkey", Seq(substring(col("c_name"), 1, 16)))
    assert(prefixOnly.count() === 0L)
    val both = EntityResolution.fuzzyMatches(df, "c_name", "c_custkey",
      Seq(substring(col("c_name"), 1, 16), substring(col("c_name"), -3, 3)))
    assert(both.count() === 1L)
  }

  test("a degenerate block drops at the cap instead of expanding") {
    val df = (1L to 50L).map(i => (i, "unknown")).toDF("c_custkey", "c_name")
    val keys = Seq(col("c_name"))
    assert(EntityResolution.fuzzyMatches(df, "c_name", "c_custkey",
      keys, maxDistance = 0, maxBlock = 10).count() === 0L)
    assert(EntityResolution.fuzzyMatches(df, "c_name", "c_custkey",
      keys, maxDistance = 0, maxBlock = 2000).count() === (50L * 49L) / 2L)
  }

  test("blockProfile: hand-checked per-pass block histogram, implied " +
      "pair cost, and what the cap would drop") {
    // pass 0 (full name): blocks {aa:3, bb:2, cc:1}; pass 1 (first
    // char): {a:3, b:2, c:1} — same sizes here by construction
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "aa"), (4L, "bb"),
      (5L, "bb"), (6L, "cc")).toDF("c_custkey", "c_name")
    val keys = Seq(col("c_name"), substring(col("c_name"), 1, 1))
    val got = EntityResolution.blockProfile(df, "c_custkey", keys,
        maxBlock = 2)
      .orderBy("pass")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // per pass: 3 blocks, 6 rows, max 3, pairs 3+1+0 = 4; the size-3
    // block is over the cap of 2 -> 1 block / 3 pairs would drop
    assert(got == Seq(
      (0L, 3L, 6L, 3L, 4L, 1L, 3L),
      (1L, 3L, 6L, 3L, 4L, 1L, 3L)))
    // the quadratic cost is COMPUTED, never performed: the report's
    // n_pairs for the capped run matches what candidatePairs emits
    // (pairs from surviving blocks only, deduped across passes)
    val kept = EntityResolution.candidatePairs(df, "c_custkey", keys,
      maxBlock = 2).count()
    assert(kept === 1L) // bb's single pair, same in both passes
  }

  test("accounting rollups compute on decimal but publish BIGINT: the " +
      "oracle schema is pinned and a sum past the Long range is a loud " +
      "error, not a silent wrap") {
    // the per-key product and the cross-block sum both run in
    // decimal(38,0) now (ANSI-off Long sum wraps silently past 2^63);
    // the published columns must stay LongType for the DuckDB oracles
    val df = Seq((1L, "aa"), (2L, "aa"), (3L, "bb"))
      .toDF("c_custkey", "c_name")
    val prof = EntityResolution.blockProfile(df, "c_custkey",
      Seq(col("c_name")))
    for (c <- Seq("n_pairs", "n_pairs_dropped"))
      assert(prof.schema(c).dataType ==
        org.apache.spark.sql.types.LongType, s"$c type drifted")
    val acct = EntityResolution.guardedBlockAccounting(df.toDF("id", "n"),
      "id", Seq(col("n")), Seq(col("n")), maxBlockPairs = 10L)
    assert(acct.schema("n_pairs").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("sizeCapFor: the derived cap is the LARGEST block size within " +
      "the pair budget (boundary law)") {
    for (b <- Seq(1L, 2L, 3L, 189L, 190L, 191L, 49999L, 50000L, 50001L,
        1L << 40)) {
      val t = EntityResolution.sizeCapFor(b)
      assert(t * (t - 1) / 2 <= b, s"cap $t overshoots budget $b")
      assert((t + 1) * t / 2 > b, s"cap $t not maximal for budget $b")
    }
    assert(EntityResolution.sizeCapFor(190L) === 20L)
    assert(EntityResolution.sizeCapFor(50000L) === 316L)
    // the exact-arithmetic ceiling: 2^60 resolves, above it refuses
    // loudly (past it the fix-up products overflow Long and would spin)
    val cap60 = EntityResolution.sizeCapFor(1L << 60)
    assert(cap60 * (cap60 - 1) / 2 <= (1L << 60))
    intercept[IllegalArgumentException] {
      EntityResolution.sizeCapFor((1L << 60) + 1)
    }
  }

  test("guarded pairs equal the lossless blocked pairs when every block " +
      "is within budget (the guard is a no-op under the cap)") {
    val rows = (0L until 60L).map(i => (i, f"Customer#$i%09d"))
    val df = rows.toDF("c_custkey", "c_name")
    val keys = Seq(
      substring(col("c_name"), 1, 16),
      substring(col("c_name"), -3, 3),
      concat(substring(col("c_name"), 1, 15),
        substring(col("c_name"), 17, 2)))
    val splits = Seq(substring(col("c_name"), -2, 2))
    val guarded = EntityResolution.guardedCandidatePairs(df, "c_custkey",
      keys, splits, maxBlockPairs = 50000L)
      .as[(Long, Long)].collect().toSet
    val plain = EntityResolution.candidatePairs(df, "c_custkey", keys)
      .as[(Long, Long)].collect().toSet
    assert(guarded === plain)
    assert(plain.nonEmpty)
  }

  test("an over-budget mega-block SPLITS through the refinement chain " +
      "and within-sub-block pairs survive; accounting is hand-checked") {
    // one constant key -> one 12-member block; budget 3 pairs -> cap 3;
    // split key (the group digit) refines it into 4 blocks of 3
    val df = (0L until 12L).map(i => (i, s"g${i / 3}_m${i % 3}"))
      .toDF("id", "name")
    val keys = Seq(lit("ALL"))
    val splits = Seq(substring(col("name"), 1, 2))
    val pairs = EntityResolution.guardedCandidatePairs(df, "id", keys,
      splits, maxBlockPairs = 3L).as[(Long, Long)].collect().toSet
    // each group of 3 yields its 3 within-group pairs; nothing crosses
    val expected = (0L until 4L).flatMap { g =>
      val m = Seq(g * 3, g * 3 + 1, g * 3 + 2)
      for (a <- m; b <- m if a < b) yield (a, b)
    }.toSet
    assert(pairs === expected)
    val acct = EntityResolution.guardedBlockAccounting(df, "id", keys,
      splits, maxBlockPairs = 3L)
      .orderBy("pass", "level", "fate")
      .as[(Long, Long, String, Long, Long, Long, Long)].collect().toSeq
    // level 0: nothing fits (the 12-block implies 66 > 3); level 1: all
    // four refined blocks of 3 are kept (3 pairs each = the cap exactly)
    assert(acct === Seq((0L, 1L, "kept", 4L, 12L, 3L, 12L)))
  }

  test("a block still over budget after the LAST split key DROPS " +
      "loudly: excluded from pairs, reported in the accounting") {
    // 8 identical names: constant block key AND constant split key —
    // refinement cannot subdivide, so the budget must refuse the block
    val same = (0L until 8L).map(i => (i, "unknown"))
    val distinct = Seq((100L, "alpha"), (101L, "alphb"))
    val df = (same ++ distinct).toDF("id", "name")
    val keys = Seq(substring(col("name"), 1, 3))
    val splits = Seq(substring(col("name"), 4, 2))
    val pairs = EntityResolution.guardedCandidatePairs(df, "id", keys,
      splits, maxBlockPairs = 3L).as[(Long, Long)].collect().toSet
    // the "unknown" block (8 members, even split-refined it stays 8)
    // drops; alpha/alphb block (2 members) pairs normally
    assert(pairs === Set((100L, 101L)))
    val acct = EntityResolution.guardedBlockAccounting(df, "id", keys,
      splits, maxBlockPairs = 3L)
      .orderBy("pass", "level", "fate")
      .as[(Long, Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(acct === Seq(
      (0L, 0L, "kept", 1L, 2L, 2L, 1L),      // alp block, 1 implied pair
      (0L, 1L, "dropped", 1L, 8L, 8L, 28L))) // unknown: 28 pairs refused
  }

  test("budget law: every kept cohort's max_block is within the " +
      "derived size cap, at every level") {
    val df = (0L until 200L).map(i => (i, f"N${i % 7}%02d_${i}%03d"))
      .toDF("id", "name")
    val budget = 10L
    val cap = EntityResolution.sizeCapFor(budget)
    val acct = EntityResolution.guardedBlockAccounting(df, "id",
      Seq(substring(col("name"), 1, 3)),
      Seq(substring(col("name"), 5, 1), substring(col("name"), 6, 1)),
      maxBlockPairs = budget)
    val kept = acct.filter(col("fate") === "kept")
      .agg(max("max_block")).as[Long].collect()(0)
    assert(kept <= cap)
    // and total kept implied pairs respects n_blocks * budget
    val row = acct.filter(col("fate") === "kept")
      .agg(sum("n_pairs"), sum("n_blocks")).as[(Long, Long)].collect()(0)
    assert(row._1 <= row._2 * budget)
  }

  test("guarded matches are SOUND: a subset of the brute-force " +
      "distance matches (the guard can only lose recall, never invent)") {
    val rows = (0L until 80L).map(i => (i, f"Customer#$i%09d"))
    val df = rows.toDF("c_custkey", "c_name")
    val got = EntityResolution.fuzzyMatchesGuarded(df, "c_name",
      "c_custkey", Seq(EntityResolution.qgramKeys(col("c_name"), 4)),
      Seq(substring(col("c_name"), 15, 2)), maxDistance = 1,
      maxBlockPairs = 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = df.as("a").crossJoin(df.as("b"))
      .filter($"a.c_custkey" < $"b.c_custkey" &&
        levenshtein($"a.c_name", $"b.c_name") <= 1)
      .select($"a.c_custkey", $"b.c_custkey").as[(Long, Long)]
      .collect().toSet
    assert(got.subsetOf(brute))
  }

  test("qgramKeys: distinct grams, short-string floor, and a shared " +
      "gram blocks a pair the positional key misses") {
    val grams = Seq(("banana")).toDF("s")
      .select(EntityResolution.qgramKeys(col("s"), 3).as("g"))
      .as[Seq[String]].collect()(0)
    assert(grams === Seq("ban", "ana", "nan"))  // distinct, order kept
    // string shorter than q: one (whole-string) gram, no empty array
    val short = Seq(("ab")).toDF("s")
      .select(EntityResolution.qgramKeys(col("s"), 3).as("g"))
      .as[Seq[String]].collect()(0)
    assert(short === Seq("ab"))
    // prefix-blocking misses a pair differing at char 1; q-grams catch
    // it through any shared interior gram
    val df = Seq((1L, "xbcdef"), (2L, "ybcdef")).toDF("id", "name")
    val viaPrefix = EntityResolution.fuzzyMatches(df, "name", "id",
      Seq(substring(col("name"), 1, 3)))
    assert(viaPrefix.count() === 0L)
    val viaQgram = EntityResolution.fuzzyMatchesGuarded(df, "name", "id",
      Seq(EntityResolution.qgramKeys(col("name"), 3)), Nil)
    assert(viaQgram.count() === 1L)
  }

  test("cross-pass duplicate candidates collapse to one pair") {
    // identical names co-block in EVERY pass; the match must appear once
    val df = Seq((1L, "same name"), (2L, "same name"))
      .toDF("c_custkey", "c_name")
    val m = EntityResolution.fuzzyMatches(df, "c_name", "c_custkey",
      Seq(col("c_name"), substring(col("c_name"), 1, 4)), maxDistance = 0)
    assert(m.count() === 1L)
    assert(m.collect()(0).getAs[Long]("distance") === 0L)
  }
}
