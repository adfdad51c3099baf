package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record deduplication: per key, keep the row with the greatest
  * ordering column (reference W1/D1 — `/root/reference/src/pipeline.py:49-75`,
  * `road_map.md:53-61`).
  *
  * Improvements over the reference (SURVEY.md §7.3):
  *  - deterministic tiebreak: after `orderCol` (and any caller-supplied
  *    `extraTiebreak` columns), every remaining orderable non-key column is
  *    appended to the window ORDER BY descending — the same lexicographic
  *    order [[DedupLatest.viaAggregate]] gets from its max-struct — so equal
  *    timestamps always resolve to the same row (the reference orders by one
  *    column only and is nondeterministic on ties);
  *  - callers may pass extra tiebreak columns to pin the priority order
  *    explicitly (e.g. a monotone surrogate id).
  *
  * Scale: one hash shuffle on the key columns; `row_number` needs no global
  * sort, only a per-key local sort. Skewed keys are handled by AQE; for
  * pathological single-key skew prefer [[DedupLatest.viaAggregate]] which does
  * a partial (map-side) max-struct aggregation instead of a full window sort.
  */
object DedupLatest {

  def apply(df: DataFrame, keys: Seq[String], orderCol: String,
      extraTiebreak: Seq[String] = Nil): DataFrame = {
    // tiebreak on the remaining payload columns, not the partition keys
    // (those are constant within a partition and break no ties); skip
    // unorderable types (maps) — they can't appear in a window ORDER BY
    val keySet = keys.toSet
    val explicit = (orderCol +: extraTiebreak).toSet
    val rest = df.schema.fields.toSeq
      .filter(f => !keySet.contains(f.name) && !explicit.contains(f.name))
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(_.name)
    val ordering: Seq[Column] =
      (orderCol +: (extraTiebreak ++ rest)).map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same semantics via `max_by`-style struct aggregation: partial aggregation
    * happens map-side before the shuffle, so the shuffle carries at most one
    * row per key per input partition — the right shape when duplicates are
    * rare and data is huge, or when one key dominates (window-sort skew).
    * Tiebreak: max over (orderCol, tiebreaks..., remaining columns) struct,
    * i.e. lexicographic and fully deterministic.
    */
  def viaAggregate(df: DataFrame, keys: Seq[String], orderCol: String,
      extraTiebreak: Seq[String] = Nil): DataFrame = {
    val keySet = keys.toSet
    val rest = df.columns.filterNot(keySet.contains).toSeq
    val orderFirst =
      (orderCol +: extraTiebreak) ++ rest.filterNot(c =>
        c == orderCol || extraTiebreak.contains(c))
    val packed = struct(orderFirst.map(col): _*)
    val agg0 = df
      .groupBy(keys.map(col): _*)
      .agg(max(packed).as("__latest"))
    val restored = rest.map(c => col(s"__latest.$c").as(c))
    agg0.select(keys.map(col) ++ restored: _*)
      .select(df.columns.map(col).toSeq: _*) // restore original column order
  }
}
