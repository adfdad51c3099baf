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
    *
    * Crash-safety of the swap: the rename-swap necessarily passes through
    * a delete-then-rename window where the live state directory is gone
    * and only the fully-written `__next` remains. [[recoverState]] closes
    * it — a missing state with a COMPLETE `__next` is a crashed swap and
    * promotes; a partial `__next` next to a live state is a crashed WRITE
    * and is discarded (the batch was never committed; the caller replays
    * it). Completeness is proven by a FRAMEWORK-OWNED sentinel
    * (`_GRAFT_COMPLETE`, written only after the state write returns), not
    * by the output committer's `_SUCCESS` marker: clusters routinely
    * disable success markers on object stores
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`), and
    * keying the promote on an optional marker would make recovery DELETE
    * the only surviving copy of the state. Without the recovery,
    * the next update would read "no state", treat the batch as the first
    * ever, and OVERWRITE the surviving merge — the entire accumulated
    * history silently lost. A promoted crashed swap counts its batch as
    * COMMITTED — a replay of that batch then double-folds, the same
    * already-documented window as a crash right after a successful swap;
    * exactly-once remains the caller's checkpoint contract.
    */
  def update(spark: SparkSession, statePath: String, batch: DataFrame,
      keys: Seq[String], valueCol: String, distinctCol: String): DataFrame = {
    val state = new org.apache.hadoop.fs.Path(statePath)
    val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(statePath + "__next")
    recoverState(fs, state, tmp)

    val batchPartials = partials(batch, keys, valueCol, distinctCol)
    val merged =
      if (fs.exists(state))
        merge(spark.read.parquet(statePath), batchPartials, keys, valueCol)
      else batchPartials

    merged.write.mode("overwrite").parquet(tmp.toString)
    // the write returning proves the dataset is complete — record that
    // with OUR sentinel (the committer's _SUCCESS may be disabled)
    fs.create(new org.apache.hadoop.fs.Path(tmp, completeSentinel), true)
      .close()
    if (fs.exists(state)) fs.delete(state, true)
    if (!fs.rename(tmp, state))
      throw new java.io.IOException(s"could not publish state at $state")
    spark.read.parquet(statePath)
  }

  /** Name of the framework-owned completion sentinel inside `__next`.
    * Underscore-prefixed so Spark's file listing ignores it as metadata.
    */
  private val completeSentinel = "_GRAFT_COMPLETE"

  /** Repair a crashed [[update]] swap before touching state: promote a
    * complete orphaned `__next` (state gone mid-swap), discard a stale
    * one (crashed mid-write, state still live). Idempotent.
    */
  private def recoverState(fs: org.apache.hadoop.fs.FileSystem,
      state: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(tmp)) {
      val complete = fs.exists(
        new org.apache.hadoop.fs.Path(tmp, completeSentinel))
      if (!fs.exists(state) && complete) {
        if (!fs.rename(tmp, state))
          throw new java.io.IOException(
            s"could not promote crashed-swap state $tmp")
      } else {
        // state live (tmp is an uncommitted crashed write), or tmp is
        // partial (crashed mid-write, nothing committed): discard
        fs.delete(tmp, true)
      }
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
