package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (mergeable) aggregation state — the building block the
  * reference lists as its own missing next step (`road_map.md:216`
  * "incremental merge") and the pattern that replaces full-refresh gold
  * tables at 100 TB: instead of re-scanning all history per run, each batch
  * folds into a per-key state table of MERGEABLE aggregates:
  *
  *  - counts and decimal sums merge by addition (exact at any batch order);
  *  - distinct counts merge via HLL sketch union (Spark's Datasketches
  *    `hll_sketch_agg` / `hll_union_agg` builtins) — same estimate as a
  *    one-shot sketch over all data, by the sketch-merge property.
  *
  * State lives as a parquet directory replaced atomically (write-new +
  * rename-swap), so a crashed run never leaves half-merged state; re-running
  * the same batch after a successful swap is NOT idempotent (it double
  * counts) — exactly-once batch delivery comes from the streaming
  * checkpoint seam ([[graft.streaming.Streams.foreachBatchParquet]]) or a
  * transactional table format when available.
  */
object Incremental {

  /** Per-key mergeable partials of one batch: `n`, `sum_<valueCol>`
    * (decimal-exact), and an HLL sketch of `distinctCol`.
    */
  def partials(batch: DataFrame, keys: Seq[String], valueCol: String,
      distinctCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as(s"sum_$valueCol"),
        hll_sketch_agg(col(distinctCol)).as("distinct_sketch"))

  /** Merge two state tables (either may be empty). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col(s"sum_$valueCol")).as(s"sum_$valueCol"),
        hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))

  /** Fold one batch into the state at `statePath` (created on first call),
    * swapping the directory atomically; returns the new state.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
      keys: Seq[String], valueCol: String, distinctCol: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val state = new org.apache.hadoop.fs.Path(statePath)
    val tmp = new org.apache.hadoop.fs.Path(statePath + "__next")

    val batchPartials = partials(batch, keys, valueCol, distinctCol)
    val merged =
      if (fs.exists(state))
        merge(spark.read.parquet(statePath), batchPartials, keys, valueCol)
      else batchPartials

    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(state)) fs.delete(state, true)
    fs.rename(tmp, state)
    spark.read.parquet(statePath)
  }

  /** Human-readable view of a state table: estimate the sketch. */
  def readState(spark: SparkSession, statePath: String,
      valueCol: String): DataFrame =
    spark.read.parquet(statePath)
      .withColumn("n_distinct",
        hll_sketch_estimate(col("distinct_sketch")))
      .withColumn(s"sum_$valueCol", col(s"sum_$valueCol").cast("double"))
      .drop("distinct_sketch")
}
