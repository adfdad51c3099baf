package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

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
  *
  * Two candidate-generation tiers: [[candidatePairs]] (fixed row cap —
  * bounds task memory, NOT total cost: a measured sf1 soak showed
  * ~1500-member blocks under a 2000 cap implying ~100M pairs) and the
  * budget-GUARDED [[guardedCandidatePairs]] (round 15), which bounds
  * both via a per-block PAIR budget with split-key refinement, loud
  * drops, and [[guardedBlockAccounting]] — prefer the guarded tier
  * whenever a blocking key's selectivity on the real data distribution
  * is not proven. [[qgramKeys]] adds non-positional ARRAY blocking for
  * distributions that collapse positional keys.
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
  /** Exact `c(c-1)/2` as a decimal(38,0) Column — overflow-IMPOSSIBLE
    * arithmetic, not merely Long-guarded: halve the EVEN factor first
    * (on the Long count, always exact), then multiply in decimal. The
    * naive Long `c*(c-1)` wraps negative past c ≈ 3.04e9, and with ANSI
    * off (the default here) both the per-key product past c ≈ 4.3e9 and
    * the cross-block `sum` wrap SILENTLY — the "loud" accounting would
    * report garbage for exactly the degenerate corpora it exists to
    * expose. In decimal the worst case fits with room: a factor is at
    * most ~9.2e18 (a Long row count), the product at most ~4.3e37
    * < 10^38, and the all-blocks total is bounded by n(n-1)/2 of the
    * whole corpus, also < 10^38. (Column `/` is double division, which
    * rounds above 2^53 where the DuckDB oracle's integer `//` would
    * not — hence the shift-then-widen.)
    */
  private def pairCount(c: Column): Column = {
    val dec = "decimal(38,0)"
    when(pmod(c, lit(2)) === 0,
      shiftright(c, 1).cast(dec) * (c - 1).cast(dec))
      .otherwise(c.cast(dec) * shiftright(c - 1, 1).cast(dec))
  }

  /** Publish a decimal(38,0) rollup as the report's BIGINT column:
    * bit-identical wherever the value fits a Long (every realistic
    * corpus — the boundary is ~9.2 QUINTILLION implied pairs), and a
    * loud error instead of a silently-wrapped total past it.
    */
  private def pairsAsLong(c: Column, what: String): Column =
    when(c <= lit(Long.MaxValue).cast("decimal(38,0)"), c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$what exceeds the Long range: "), c.cast("string"),
        lit(" implied pairs; this corpus is degenerate far beyond any " +
          "usable blocking key"))))

  def blockProfile(df: DataFrame, idCol: String, blockKeys: Seq[Column],
      maxBlock: Int = 2000): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val passes = blockKeys.zipWithIndex.map { case (k, i) =>
      df.select(lit(i.toLong).as("pass"), k.cast("string").as("__bk"),
        col(idCol).as("__rid"))
    }
    val pairsOf = pairCount _
    passes.reduce(_ unionByName _)
      .groupBy("pass", "__bk")
      .agg(count(lit(1)).as("__c"))
      .groupBy("pass")
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_block"),
        sum(pairsOf(col("__c"))).as("__np"),
        sum(when(col("__c") > maxBlock, 1L).otherwise(0L))
          .as("n_blocks_over_cap"),
        sum(when(col("__c") > maxBlock, pairsOf(col("__c")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("__npd"))
      .select(col("pass"), col("n_blocks"), col("n_rows"),
        col("max_block"),
        pairsAsLong(col("__np"), "blockProfile n_pairs").as("n_pairs"),
        col("n_blocks_over_cap"),
        pairsAsLong(col("__npd"), "blockProfile n_pairs_dropped")
          .as("n_pairs_dropped"))
  }

  /** Largest block size whose implied pair cost `c(c-1)/2` fits within
    * `maxBlockPairs` — the budget→cap mapping of the guarded blocking
    * path. Closed-form sqrt with integer fix-up at the boundary (the
    * double root can land one off for budgets near 2^52).
    */
  private[operators] def sizeCapFor(maxBlockPairs: Long): Long = {
    require(maxBlockPairs >= 1, "maxBlockPairs must be >= 1")
    // above 2^60 the fix-up products overflow Long and go NEGATIVE —
    // the increment loop would then never terminate. No real budget is
    // within orders of magnitude of this; refuse loudly instead of
    // hanging the driver.
    require(maxBlockPairs <= (1L << 60),
      s"maxBlockPairs $maxBlockPairs is beyond the exact-arithmetic " +
        "range (2^60); a per-block pair budget this size is not a guard")
    var t = math.max(1L,
      ((1.0 + math.sqrt(1.0 + 8.0 * maxBlockPairs.toDouble)) / 2.0).toLong)
    while (t > 1 && t * (t - 1) / 2 > maxBlockPairs) t -= 1
    while ((t + 1) * t / 2 <= maxBlockPairs) t += 1
    t
  }

  // refinement-key separators: u0001 between key and split value,
  // u0002 for a NULL split value — both outside every realistic key
  // alphabet, so a refined key can never collide with a sibling
  private val KeySep = "\u0001"
  private val NullSplit = "\u0002"

  /** The multi-pass blocked stream `(__pass, __bk, __rid, __s0..__sN)`
    * with the split-key values materialized ONCE at the source — the
    * refinement levels below never look back at the input columns, so
    * the stream they shuffle is (pass, key, id, a few short split
    * strings), never names. An ARRAY-typed blocking key (e.g.
    * [[qgramKeys]]) explodes — the record enters one block per element.
    * A NULL blocking key blocks nothing (dropped here): Spark's groupBy
    * would pool NULL keys into one block, silently diverging from the
    * SQL self-join replay where `NULL = NULL` never matches.
    */
  private def blockedBase(df: DataFrame, idCol: String,
      blockKeys: Seq[Column], splitKeys: Seq[Column]): DataFrame = {
    val splitNames = splitKeys.indices.map(i => s"__s$i")
    val splitCols = splitKeys.zip(splitNames).map { case (s, n) =>
      coalesce(s.cast("string"), lit(NullSplit)).as(n)
    }
    val passes = blockKeys.zipWithIndex.map { case (k, i) =>
      val keyed = df.select(
        (Seq(col(idCol).as("__rid"), k.as("__k0")) ++ splitCols): _*)
      val isArray = keyed.schema("__k0").dataType.isInstanceOf[ArrayType]
      val bk =
        if (isArray) explode(array_distinct(col("__k0")).cast("array<string>"))
        else col("__k0").cast("string")
      keyed.select(
        (Seq(lit(i.toLong).as("__pass"), bk.as("__bk"), col("__rid")) ++
          splitNames.map(col)): _*)
    }
    passes.reduce(_ unionByName _).filter(col("__bk").isNotNull)
  }

  /** Budget-guarded blocking refinement — the enforcement half of
    * [[blockProfile]]. Motivated by a measured failure (round-14 sf1
    * soak): quadratic pair cost hides BELOW a fixed `maxBlock` row cap —
    * ~1500-member blocks, each under the 2000 default, implied ~100M
    * candidate pairs (291 s, 68 GB heap). A row cap bounds task memory
    * but not total cost; this path bounds BOTH, per block, by a pair
    * budget: every finalized block satisfies `c(c-1)/2 <= maxBlockPairs`
    * ([[sizeCapFor]] derives the size cap), so total candidate cost is
    * `<= n_final_blocks * maxBlockPairs` and no task ever buffers more
    * than cap ids.
    *
    * Level L=0..splitKeys.length: blocks within budget finalize; blocks
    * over it refine their key with `splitKeys(L)` and try again; blocks
    * still over budget after the last split key DROP — loudly, the
    * accounting ([[guardedBlockAccounting]]) reports every
    * (pass, level, fate) cohort. Deterministic and SQL-replayable: the
    * oracle unrolls the same windowed-count cascade.
    *
    * Scale shape (the FUSED cascade): each level is ONE aggregation —
    * [[graft.functions.expr.AggExprs.collectCapped]] members + a true
    * count per (pass, key), so a kept block's pair expansion needs no
    * second pass and no task ever buffers more than cap+1 ids — plus,
    * only when blocks actually exceeded the budget, a semi-join of the
    * level's stream against the (small, typically broadcast) over-cap
    * key set to advance those rows re-keyed. In the common all-kept
    * case the whole guard costs what the unguarded path costs: one
    * aggregation. The stream carries ids and short split strings, never
    * payload columns. `splitKeys` is meant to be SHORT (require <= 4) —
    * two well-chosen splits subdivide any realistic degenerate key.
    *
    * Returns the block LEDGER: one row per finalized block —
    * `(__pass, __level, __fate, __bk, __bucket, __c)` with fate in
    * {kept, dropped}, `__bucket` the member ids (complete iff kept),
    * `__c` the TRUE block size (dropped blocks report real cost).
    */
  private def refineLedger(df: DataFrame, idCol: String,
      blockKeys: Seq[Column], splitKeys: Seq[Column],
      cap: Long): DataFrame = {
    require(splitKeys.length <= 4,
      "splitKeys is a short refinement chain (<= 4): each level adds an " +
        "aggregation pass over the still-oversized stream")
    require(cap < Int.MaxValue, "pair budget implies a block cap beyond Int")
    val levels = splitKeys.length
    var cur = blockedBase(df, idCol, blockKeys, splitKeys)
    val out = Seq.newBuilder[DataFrame]
    for (lvl <- 0 to levels) {
      val agg = cur.groupBy("__pass", "__bk")
        .agg(graft.functions.expr.AggExprs
          .collectCapped(col("__rid"), cap.toInt).as("__bucket"),
          count(lit(1)).as("__c"))
      if (lvl < levels) {
        out += agg.filter(col("__c") <= cap)
          .select(col("__pass"), lit(lvl.toLong).as("__level"),
            lit("kept").as("__fate"), col("__bk"), col("__bucket"),
            col("__c"))
        val overKeys = agg.filter(col("__c") > cap)
          .select("__pass", "__bk")
        cur = cur.join(overKeys, Seq("__pass", "__bk"), "left_semi")
          .withColumn("__bk",
            concat(col("__bk"), lit(KeySep), col(s"__s$lvl")))
      } else {
        out += agg.select(col("__pass"), lit(lvl.toLong).as("__level"),
          when(col("__c") <= cap, lit("kept")).otherwise(lit("dropped"))
            .as("__fate"),
          col("__bk"), col("__bucket"), col("__c"))
      }
    }
    out.result().reduce(_ unionByName _)
  }

  /** Candidate pairs under an enforced per-block pair budget — see
    * [[refineLedger]] for the split/drop contract. Pairs expand only
    * within finalized kept blocks (every one provably implies
    * `<= maxBlockPairs` pairs) — LOCALLY, from the ledger's
    * already-collected member arrays ([[Dedup.expandBucketPairs]]) —
    * deduped across passes and levels.
    */
  def guardedCandidatePairs(df: DataFrame, idCol: String,
      blockKeys: Seq[Column], splitKeys: Seq[Column],
      maxBlockPairs: Long = 50000L): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val cap = sizeCapFor(maxBlockPairs)
    val kept = refineLedger(df, idCol, blockKeys, splitKeys, cap)
      .filter(col("__fate") === "kept" && col("__c") >= 2)
    // Compute-density fix (guide §2.5/§2.6): AQE sizes post-shuffle
    // partitions by BYTES, but a candidate-pair row is 16 bytes that
    // costs a Levenshtein verify downstream — the dedup+verify stages
    // measured running at 6-10 of 32 tasks (r21 profile: they carried
    // most of x129's 32 CPU·s). The pair-dedup exchange is made explicit
    // on its own (id_a, id_b) key at the session's shuffle width — the
    // same partitioning EnsureRequirements would insert, so no extra
    // shuffle, but REPARTITION_BY_NUM is exempt from AQE coalescing, so
    // the verify stage keeps the configured width instead of being
    // byte-coalesced. Trade-off, accepted with numbers: the user
    // repartition sits below the dedup aggregate, so the partial
    // (map-side) pair dedup moves above the exchange and the shuffle
    // carries cross-pass duplicates — bounded by the pass count
    // (positional keys) or the shared-q-gram count, of 16-byte rows.
    // Two shapes that preserved the partial dedup were A/B'd and not
    // kept: a round-robin or id_a-hash repartition AFTER dropDuplicates
    // (one extra exchange + stage per consumer: equal-or-worse wall,
    // more summed task time), and a round-robin spread of the LEDGER
    // before expansion (no additional win — the expansion is cheap
    // relative to the verify).
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    Dedup.expandBucketPairs(kept)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .repartition(n, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Split/drop accounting for [[guardedCandidatePairs]]: per
    * (pass, level, fate) — block count, row count, largest block, and
    * implied pair cost. The quadratic cost is COMPUTED, never performed;
    * `fate = dropped` rows are the blocks the budget refused after the
    * last split key, made loud instead of silently expensive.
    */
  def guardedBlockAccounting(df: DataFrame, idCol: String,
      blockKeys: Seq[Column], splitKeys: Seq[Column],
      maxBlockPairs: Long = 50000L): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    val cap = sizeCapFor(maxBlockPairs)
    val pairsOf = pairCount _
    refineLedger(df, idCol, blockKeys, splitKeys, cap)
      .groupBy(col("__pass").as("pass"), col("__level").as("level"),
        col("__fate").as("fate"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_block"),
        sum(pairsOf(col("__c"))).as("__np"))
      .withColumn("n_pairs",
        pairsAsLong(col("__np"), "guardedBlockAccounting n_pairs"))
      .drop("__np")
  }

  /** Distinct character q-grams of `c` as an ARRAY blocking key for
    * [[guardedCandidatePairs]]: the record enters one block per q-gram.
    * Non-positional, so it survives the name distributions that collapse
    * a single positional key (round-14 soak: suffix-3 on realistic
    * names) — two strings within one edit share every q-gram the edit
    * does not touch. The flip side is the stop-gram problem: a q-gram
    * common to the whole corpus is a universal block, which is exactly
    * what the pair budget splits or drops.
    */
  def qgramKeys(c: Column, q: Int): Column = {
    require(q >= 1, "q must be >= 1")
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (q - 1), lit(1))),
      i => c.substr(i, lit(q))))
  }

  /** [[fuzzyMatches]] with candidates from the budget-guarded path —
    * same verification (exact Levenshtein <= maxDistance), bounded
    * candidate cost. Use when a blocking key may be degenerate on the
    * real data distribution.
    */
  def fuzzyMatchesGuarded(df: DataFrame, nameCol: String, idCol: String,
      blockKeys: Seq[Column], splitKeys: Seq[Column],
      maxDistance: Int = 1, maxBlockPairs: Long = 50000L): DataFrame = {
    require(maxDistance >= 0, "maxDistance must be >= 0")
    val names = df.select(col(idCol), col(nameCol))
    guardedCandidatePairs(df, idCol, blockKeys, splitKeys, maxBlockPairs)
      .join(names.select(col(idCol).as("id_a"),
        col(nameCol).as("name_a")), Seq("id_a"))
      .join(names.select(col(idCol).as("id_b"),
        col(nameCol).as("name_b")), Seq("id_b"))
      // thresholded form: O(len*maxDistance) with early exit instead of
      // the full O(len^2) matrix, and identical values for every pair
      // the filter keeps (above-threshold pairs return -1, excluded by
      // the between) — per-pair verify is the candidate stream's hot loop
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b"), maxDistance)
          .cast("long"))
      .filter(col("distance").between(0, maxDistance))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("distance"))
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
      // thresholded verify — see [[fuzzyMatchesGuarded]]
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b"), maxDistance)
          .cast("long"))
      .filter(col("distance").between(0, maxDistance))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("distance"))
  }
}
