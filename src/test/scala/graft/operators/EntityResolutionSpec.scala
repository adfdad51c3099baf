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
