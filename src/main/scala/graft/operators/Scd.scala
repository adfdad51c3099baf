package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build from an append-only change
  * stream — the lakehouse dimension-history staple the reference's
  * medallion pipeline stops short of (its dims are Type 1 overwrites;
  * `/root/reference/src/pipeline.py:175-208` rebuilds dim_customer from
  * the latest snapshot). SCD2 keeps every attribute regime as an
  * `[eff_from, eff_to)` interval so facts can join "as of" their own
  * timestamp (see [[AsOfJoin]] for the probe side).
  *
  * Semantics: rows are ordered per key by `(tsCol, idCol)` (the id
  * breaks timestamp ties deterministically — the [[DedupLatest]]
  * convention); a new interval opens at every row whose tracked
  * attribute tuple differs (null-safely) from the previous row's, and
  * closes at the NEXT interval's open. Consecutive rows with identical
  * attributes collapse into one interval. The last interval per key is
  * open-ended (`eff_to` null, `is_current` true). `version` numbers a
  * key's intervals from 1 in order.
  *
  * Scale shape: both windows partition on the dimension key, so the
  * plan is ONE shuffle by key; the change-filter runs between them
  * without disturbing partitioning OR sort order, so the second window
  * reuses the first's exchange and sort (no second exchange — pinned in
  * PlanQualitySpec). Partition size is one entity's change history —
  * bounded by per-entity activity, never corpus volume. At 100 TB the
  * shuffle carries (key, ts, id, attrs) only; no global sort anywhere.
  */
object Scd {

  /** Build the SCD2 interval table: `(keyCol, attrCols*, eff_from,
    * eff_to, is_current, version)`.
    */
  def scd2(df: DataFrame, keyCol: String, attrCols: Seq[String],
      tsCol: String, idCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val attrs = struct(attrCols.map(col): _*)
    // null-safe change predicate: a null attribute differing from a
    // non-null one (or a first row) must open an interval too
    val changed = !(attrs <=> lag(attrs, 1).over(w))
    val opens = df
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .select((keyCol +: attrCols).map(col) :+ col(tsCol).as("eff_from")
        :+ col(idCol).as("__id"): _*)
    // same partitioning + prefix sort order as `w`: Catalyst plans no
    // second exchange and no second sort for this window
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("eff_from"), col("__id"))
    opens
      .withColumn("eff_to", lead(col("eff_from"), 1).over(w2))
      .withColumn("is_current", col("eff_to").isNull)
      .withColumn("version", row_number().over(w2).cast("long"))
      .drop("__id")
  }

  /** Point-in-time lookup against an SCD2 table built by [[scd2]]:
    * the interval containing `asOf` per key (half-open `[from, to)`).
    */
  def asOf(scd: DataFrame, asOfTs: Column): DataFrame =
    scd.filter(col("eff_from") <= asOfTs &&
      (col("eff_to").isNull || col("eff_to") > asOfTs))
}
