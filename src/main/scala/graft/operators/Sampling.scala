package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting and sampling for training-data pipelines.
  *
  * Both splitters are pure projections over a key — no shuffle, no state,
  * and stable across runs/engines/cluster layouts, which is the property
  * that matters for reproducible train/eval splits at 100 TB (Spark's
  * `randomSplit` is seed-stable only for a fixed partitioning, so it is NOT
  * reproducible across repartitioned reruns; key-based assignment is).
  */
object Sampling {

  /** Bucket assignment in [0, buckets) by 64-bit key hash — uniform for any
    * key distribution (use for ids with structure, e.g. sequential).
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(xxhash64(key), lit(buckets.toLong)).cast("int")

  /** Deterministic split: rows whose hash bucket falls below
    * `testPermille`/1000 go to the test side. Returns (train, test) —
    * disjoint, exhaustive, reproducible from the key alone.
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
      testPermille: Int = 100): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol), 1000)
    (df.filter(b >= testPermille), df.filter(b < testPermille))
  }

  /** Modulo split on an integer key: portable to any engine (used by the
    * oracle-checked split query); prefer [[deterministicSplit]] when key
    * values may be correlated with data properties.
    */
  def moduloSplit(df: DataFrame, keyCol: String, modulus: Int = 10,
      testResidue: Int = 0): (DataFrame, DataFrame) = {
    val r = pmod(col(keyCol), lit(modulus))
    (df.filter(r =!= testResidue), df.filter(r === testResidue))
  }

  /** Stratified sample: per-stratum fractions without replacement
    * (`df.stat.sampleBy`), seeded. Use to rebalance skewed strata (e.g.
    * per-language document quotas) in one pass.
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
