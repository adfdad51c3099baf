package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal-Srikant support /
  * confidence / lift over item co-occurrence in transactions) — the
  * classic "parts bought together" analysis over the fact table, and a
  * corpus-curation tool in disguise (source/tag co-occurrence audits).
  *
  * Scale design: ONE transaction-keyed shuffle collects each basket
  * under the capped-collect guard ([[graft.functions.expr.AggExprs
  * .collectCapped]] — the LSH-bucket guard: a basket of b items is b²
  * pairs, so a degenerate mega-basket is structurally dropped rather
  * than trusted; the cap applies to the transaction's LINE count, so an
  * overflowing bag drops before its distinct set is even built). Item
  * sets dedupe and sort LOCALLY inside the collected row; pairs expand
  * locally (sorted set → a < b for free); item frequencies, the
  * transaction total, and pair counts are all combiner-backed
  * aggregations over that one collected frame — pair-TYPE cardinality,
  * never transaction volume, reaches the final rule join, and the rule
  * table never re-derives the corpus (both rule directions explode from
  * one pair row; item counts and N broadcast back).
  *
  * Determinism: all counts are exact longs; support/confidence are one
  * exact long-ratio division each and lift one division of two exact
  * decimal(38,0) products (`n_ab·N` and `n_a·n_b` can pass 2^63 at
  * catalog scale, so they multiply wrap-proof in decimal before the
  * double cast) — single IEEE ops, bit-identical cross-engine, no
  * rounding needed (the x80 convention).
  */
object MarketBasket {

  /** Per-transaction sorted distinct item sets `(__t, __set)`;
    * transactions whose raw line count exceeds `maxBasketSize` drop
    * whole (the capped-collect overflow signal).
    */
  private def basketSets(df: DataFrame, txnCol: String, itemCol: String,
      maxBasketSize: Int): DataFrame =
    df.select(col(txnCol).as("__t"), col(itemCol).as("__i"))
      .groupBy("__t")
      .agg(graft.functions.expr.AggExprs
        .collectCapped(col("__i"), maxBasketSize).as("__bag"))
      .filter(size(col("__bag")) <= maxBasketSize)
      .select(col("__t"),
        array_sort(array_distinct(col("__bag"))).as("__set"))

  /** Distinct-item co-occurrence counts per unordered pair:
    * `(item_a, item_b, n_ab)` with item_a < item_b.
    */
  def pairCounts(df: DataFrame, txnCol: String, itemCol: String,
      maxBasketSize: Int = 10000): DataFrame =
    pairsOf(basketSets(df, txnCol, itemCol, maxBasketSize))

  /** Local pair expansion over sorted sets (the [[Dedup.bucketPairs]]
    * slice pattern; sortedness makes least/greatest unnecessary).
    */
  private def pairsOf(sets: DataFrame): DataFrame =
    sets
      .filter(size(col("__set")) >= 2)
      .select(col("__set"), posexplode(col("__set")).as(Seq("__ix", "__a")))
      .select(col("__a"),
        explode(slice(col("__set"), col("__ix") + lit(2),
          size(col("__set")) - col("__ix") - lit(1))).as("__b"))
      .groupBy(col("__a").as("item_a"), col("__b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))

  /** Association rules in BOTH directions for every pair with
    * `n_ab >= minSupport`: `(antecedent, consequent, n_ab, n_ante,
    * n_cons, n_txn, support, confidence, lift)`.
    */
  def rules(df: DataFrame, txnCol: String, itemCol: String,
      minSupport: Long = 3L, maxBasketSize: Int = 10000): DataFrame = {
    val sets = basketSets(df, txnCol, itemCol, maxBasketSize)
    val itemCounts = sets.select(explode(col("__set")).as("__item"))
      .groupBy("__item").agg(count(lit(1)).as("__n_item"))
    // broadcast single-row agg (the x68 convention), NOT a driver
    // count(): the whole rule build stays one lazy job
    val nTxn = sets.agg(count(lit(1)).as("n_txn"))
    val pairs = pairsOf(sets).filter(col("n_ab") >= minSupport)
    // both directions from ONE pair row — a union here would duplicate
    // the entire basket/pair subtree in the plan
    val directed = pairs.select(explode(array(
        struct(col("item_a").as("antecedent"),
          col("item_b").as("consequent"), col("n_ab")),
        struct(col("item_b").as("antecedent"),
          col("item_a").as("consequent"), col("n_ab")))).as("__r"))
      .select(col("__r.antecedent"), col("__r.consequent"),
        col("__r.n_ab"))
    directed
      .join(broadcast(itemCounts),
        col("antecedent") === col("__item"))
      .withColumnRenamed("__n_item", "n_ante").drop("__item")
      .join(broadcast(itemCounts),
        col("consequent") === col("__item"))
      .withColumnRenamed("__n_item", "n_cons").drop("__item")
      .crossJoin(broadcast(nTxn))
      .withColumn("support",
        col("n_ab").cast("double") / col("n_txn").cast("double"))
      .withColumn("confidence",
        col("n_ab").cast("double") / col("n_ante").cast("double"))
      // the long products can exceed 2^63 at catalog scale (1e10 txns x
      // 1e9 pair count ~ 1e19): multiply in decimal(38,0) — wrap-proof
      // with ANSI off, no spurious overflow error with ANSI on — then
      // cast; an exact-integer decimal casts to the same double a long
      // would (the joinHotspots / EntityResolution.pairCount convention)
      .withColumn("lift",
        (col("n_ab").cast("decimal(38,0)") *
          col("n_txn").cast("decimal(38,0)")).cast("double") /
          (col("n_ante").cast("decimal(38,0)") *
            col("n_cons").cast("decimal(38,0)")).cast("double"))
  }
}
