package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked pairwise fuzzy matching — the entity-resolution core
  * (Fellegi-Sunter shape: blocking for candidate generation, a string
  * metric for verification). Finds record pairs whose `nameCol` is within
  * `maxDistance` Levenshtein edits without ever forming the n² cross
  * join: each blocking key groups plausibly-matching records, pairs
  * expand only within blocks, and the exact distance filters candidates.
  *
  * Multi-pass blocking is the recall mechanism: one key misses matches
  * that differ inside it, so several complementary keys (prefix, suffix,
  * skip-position) run as passes and the pair union dedupes. For
  * fixed-length keys and substitution-only distance d, key choices whose
  * "uncovered" positions total < d+1 make blocking provably lossless —
  * `EntityResolutionSpec` checks the brute-force-equality law for the
  * x74 key set.
  *
  * Scale shape: the blocked stream carries (pass, key, id) — no names;
  * per-block pair expansion is the capped-collect guard of the LSH tier
  * ([[Dedup.bucketPairs]]): a degenerate block (everyone named "unknown")
  * drops with the overflow signal instead of exploding quadratically.
  * Names join back only for surviving candidate pairs; `levenshtein` is
  * codegen'd. Shuffles: one per pass union for the aggregation, one for
  * the pair dedup, two id-keyed name fetch joins.
  */
object EntityResolution {

  /** Candidate pairs `(id_a, id_b)` from multi-pass blocking, deduped
    * across passes. `blockKeys` are expressions over the input columns.
    */
  def candidatePairs(df: DataFrame, idCol: String,
      blockKeys: Seq[Column], maxBlock: Int = 2000): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val passes = blockKeys.zipWithIndex.map { case (k, i) =>
      df.select(lit(i).as("__pass"), k.cast("string").as("__bk"),
        col(idCol).as("__rid"))
    }
    val blocked = passes.reduce(_ unionByName _)
    Dedup.bucketPairs(blocked, Seq("__pass", "__bk"), col("__rid"),
        maxBlock)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Blocking pre-flight: per pass, the block-size distribution and the
    * QUADRATIC pair cost it implies — the numbers a `maxBlock` /
    * key-selectivity decision needs BEFORE paying candidate generation.
    * Motivated by a measured blowup (round-14 sf1 soak, COVERAGE.md):
    * a low-selectivity key produced ~1500-member blocks — UNDER the
    * 2000 default cap, so nothing overflow-dropped — and ~100M candidate
    * pairs, 178× the expected cost, invisibly. This report makes that
    * visible for the price of one aggregation per pass (shuffle ≤
    * distinct blocking keys; the quadratic work is COMPUTED, never
    * performed): rows, blocks, the largest block, the implied pair
    * count `Σ c(c-1)/2`, and what the cap would drop. Read it as: if
    * `n_pairs` is orders of magnitude above `n_rows`, pick a more
    * selective key or lower `maxBlock` (dropped blocks stay visible via
    * `n_blocks_over_cap`).
    */
  def blockProfile(df: DataFrame, idCol: String, blockKeys: Seq[Column],
      maxBlock: Int = 2000): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val passes = blockKeys.zipWithIndex.map { case (k, i) =>
      df.select(lit(i.toLong).as("pass"), k.cast("string").as("__bk"),
        col(idCol).as("__rid"))
    }
    // c*(c-1) is even, so a right shift is the EXACT halving — Column `/`
    // is double division, which rounds above 2^53 implied pairs (a ~1e8
    // block) where the DuckDB oracle's integer `//` would not
    val pairsOf = (c: Column) => shiftright(c * (c - 1), 1)
    passes.reduce(_ unionByName _)
      .groupBy("pass", "__bk")
      .agg(count(lit(1)).as("__c"))
      .groupBy("pass")
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_block"),
        sum(pairsOf(col("__c"))).as("n_pairs"),
        sum(when(col("__c") > maxBlock, 1L).otherwise(0L))
          .as("n_blocks_over_cap"),
        sum(when(col("__c") > maxBlock, pairsOf(col("__c")))
          .otherwise(0L)).as("n_pairs_dropped"))
  }

  /** Matched pairs `(id_a, id_b, name_a, name_b, distance)` with
    * Levenshtein distance <= `maxDistance`, candidates from
    * [[candidatePairs]].
    */
  def fuzzyMatches(df: DataFrame, nameCol: String, idCol: String,
      blockKeys: Seq[Column], maxDistance: Int = 1,
      maxBlock: Int = 2000): DataFrame = {
    require(maxDistance >= 0, "maxDistance must be >= 0")
    val names = df.select(col(idCol), col(nameCol))
    candidatePairs(df, idCol, blockKeys, maxBlock)
      .join(names.select(col(idCol).as("id_a"),
        col(nameCol).as("name_a")), Seq("id_a"))
      .join(names.select(col(idCol).as("id_b"),
        col(nameCol).as("name_b")), Seq("id_b"))
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("distance"))
  }
}
