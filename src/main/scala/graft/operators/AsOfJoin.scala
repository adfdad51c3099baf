package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Backward as-of join: for each left row, attach the latest right row whose
  * timestamp is <= (or <, if not inclusive) the left timestamp, per key —
  * the standard point-in-time join of time-series/feature-store systems
  * (Spark has no built-in as-of join; this is the composed-operator
  * formulation, preference (a) in the extension guide).
  *
  * Implementation: tag both sides, union on the common layout, and take a
  * per-key running `last(struct(payload...), ignoreNulls)` over rows ordered
  * by (ts, side) — right rows populate the payload struct, left rows read it.
  * The payload travels as ONE struct so every output field comes from the same
  * (latest) right row even when some of its fields are null — per-column
  * `last(ignoreNulls)` would stitch fields from different right rows. One hash
  * shuffle on the key + a per-key sort; no range-explosion, no per-row probe,
  * so cost is O((|L|+|R|) log) per key group regardless of time span — the
  * shape that survives 100 TB (a broadcast-range or theta-join formulation
  * would not).
  *
  * Tie semantics: right rows at ts equal to a left row's ts sort before the
  * left row (side 0 < side 1) when `inclusive`, after it otherwise; among
  * right rows with identical (key, ts), the greatest `rightTiebreak` wins —
  * deterministic.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: Option[String] = None,
      inclusive: Boolean = true): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      "payload column names must not collide with left columns")
    val reserved = Seq("__ts", "__side", "__tb", "__p")
    require(!(leftCols ++ payload).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by AsOfJoin")

    // the whole payload rides in one struct: null for left rows (so
    // last(ignoreNulls) skips them), non-null for every right row — even one
    // whose payload fields are all null, which correctly "wins" as-of
    val payloadType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    // a right row with a NULL timestamp has no as-of position — unfiltered
    // it would sort FIRST in the ascending scan (nulls-first) and become
    // the initial carried payload, silently attaching itself to every left
    // row that has no true predecessor
    val rightSide = right
      .filter(col(rightTs).isNotNull)
      .select(
      (keys.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        coalesce(rightTiebreak.map(col).getOrElse(lit(0L)).cast("long"),
          lit(0L)).as("__tb") :+
        struct(payload.map(c => col(c).as(c)): _*).cast(payloadType)
          .as("__p")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val leftSide = left.select(
      (keys.map(col) :+
        col(leftTs).cast(right.schema(rightTs).dataType).as("__ts") :+
        lit(1).as("__side") :+
        lit(0L).as("__tb") :+
        lit(null).cast(payloadType).as("__p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // null-ts LEFT rows keep left-join semantics (they survive with a null
    // payload): asc_nulls_first scans them before any right payload exists
    val sideOrder = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, sideOrder, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightSide.unionByName(leftSide)
      .select(
        (keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) :+
          col("__side") :+ col("__ts") :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)

    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * whose timestamp is >= (or >, if not inclusive) the left timestamp, per
    * key — the "next event after" lookup (e.g. first purchase after a view).
    *
    * Same union + running-window shape as [[backward]], with the scan
    * direction reversed (timestamps ordered descending, so the running
    * `last(ignoreNulls)` carries the earliest-at-or-after right row). Among
    * right rows tied on (key, ts), the SMALLEST `rightTiebreak` wins.
    */
  def forward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: Option[String] = None,
      inclusive: Boolean = true): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      "payload column names must not collide with left columns")
    val reserved = Seq("__ts", "__side", "__tb", "__p")
    require(!(leftCols ++ payload).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by AsOfJoin")

    val payloadType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    // null-ts right rows have no as-of position (see backward)
    val rightSide = right
      .filter(col(rightTs).isNotNull)
      .select(
      (keys.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        coalesce(rightTiebreak.map(col).getOrElse(lit(0L)).cast("long"),
          lit(0L)).as("__tb") :+
        struct(payload.map(c => col(c).as(c)): _*).cast(payloadType)
          .as("__p")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val leftSide = left.select(
      (keys.map(col) :+
        col(leftTs).cast(right.schema(rightTs).dataType).as("__ts") :+
        lit(1).as("__side") :+
        lit(0L).as("__tb") :+
        lit(null).cast(payloadType).as("__p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // descending scan: at each left row, the last non-null payload seen is
    // the right row with the smallest ts >= left ts (ties: smallest __tb,
    // since __tb descends and last() takes the latest in frame order).
    // desc_nulls_first so a null-ts LEFT row is scanned before any right
    // payload exists — it survives with a null payload instead of silently
    // attaching the earliest right row (desc puts nulls LAST by default).
    val sideOrder = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc_nulls_first, sideOrder, col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightSide.unionByName(leftSide)
      .select(
        (keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) :+
          col("__side") :+ col("__ts") :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)

    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p.$c").as(c)): _*)
  }
}
