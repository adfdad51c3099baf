package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join splitting (on in every [[graft.engine.SparkEnv]] session)
  * handles sort-merge skew transparently; explicit salting remains the tool
  * when (a) the skewed side must hash-join against a mid-sized build side
  * that cannot broadcast, or (b) a `groupBy` on the hot key itself is the
  * bottleneck. Standard technique: replicate the build side `saltFactor`
  * ways and scatter the probe side uniformly across the replicas, so one hot
  * key spreads over `saltFactor` tasks.
  */
object Skew {

  /** Salted inner equi-join: `big ⋈ small` on `key`, with the small side
    * replicated `saltFactor` times. Correct for any key distribution;
    * costs `saltFactor`x the small side (which is why the small side must be
    * small — for broadcastable sides just use `broadcast()` instead).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig
      .join(saltedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. Use when a single group dominates and must not
    * land on one reducer. `partials` maps each aggregation to its
    * (partial expression, final combiner) pair — e.g. sum/sum, count/sum.
    */
  /** Join pre-flight diagnostic: the top-`topN` keys by OUTPUT PAIR
    * count (`n_left * n_right`) — the keys that would dominate
    * `left ⋈ right on key` and the number every skew decision (salt?
    * AQE? broadcast? pre-aggregate?) actually needs, which per-side
    * heavy-hitter lists don't give (a key hot on one side and absent
    * on the other produces ZERO pairs).
    *
    * Scale: one partial-aggregated groupBy per side (shuffle ≤ distinct
    * keys), an equi-join of the two key histograms, and a
    * TakeOrderedAndProject for the top-N — output bounded at `topN`
    * regardless of input size. Deterministic: ties on the pair count
    * break by key ascending.
    */
  def joinHotspots(left: DataFrame, right: DataFrame, key: String,
      topN: Int = 20): DataFrame = {
    require(topN > 0, "topN must be positive")
    val lc = left.groupBy(key).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(key).agg(count(lit(1)).as("n_right"))
    // pair count multiplies in decimal(38,0): two Long row counts can
    // exceed Long when multiplied, and with ANSI off the wrap is SILENT
    // — garbage ranking from exactly the mega-hot key this diagnostic
    // exists to expose (the EntityResolution.pairCount convention). The
    // published column stays BIGINT, loud past the Long range.
    val dec = "decimal(38,0)"
    val pairsDec = col("n_left").cast(dec) * col("n_right").cast(dec)
    lc.join(rc, Seq(key))
      .withColumn("__np", pairsDec)
      .orderBy(col("__np").desc, col(key).asc)
      .limit(topN)
      .withColumn("n_pairs",
        when(col("__np") <= lit(Long.MaxValue).cast(dec),
          col("__np").cast("long"))
          .otherwise(raise_error(concat(
            lit("joinHotspots n_pairs exceeds the Long range: "),
            col("__np").cast("string")))))
      .drop("__np")
  }

  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pn")).as("n"))
}
