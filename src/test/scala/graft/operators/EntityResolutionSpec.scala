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
