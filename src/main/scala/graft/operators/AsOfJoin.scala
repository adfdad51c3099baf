package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row whose
  * timestamp is <= (or <, if not inclusive) the left timestamp, per key —
  * the standard point-in-time join of time-series/feature-store systems
  * (Spark has no built-in as-of join; this is the composed-operator
  * formulation, preference (a) in the extension guide).
  *
  * Implementation: tag both sides, union on the common layout, and take a
  * per-key running `last(payload, ignoreNulls)` over rows ordered by
  * (ts, side) — right rows populate the payload, left rows read it. One hash
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
    val reserved = Seq("__ts", "__side", "__tb")
    require(!(leftCols ++ payload).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by AsOfJoin")

    val rightSide = right.select(
      (keys.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        coalesce(rightTiebreak.map(col).getOrElse(lit(0L)).cast("long"),
          lit(0L)).as("__tb")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val leftSide = left.select(
      (keys.map(col) :+
        col(leftTs).cast(right.schema(rightTs).dataType).as("__ts") :+
        lit(1).as("__side") :+
        lit(0L).as("__tb")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val sideOrder = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, sideOrder, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightSide.unionByName(leftSide)
      .select(
        (keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) :+
          col("__side") :+ col("__ts")) ++
          payload.map(c =>
            last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c)): _*)

    filled.filter(col("__side") === 1).drop("__side", "__ts")
      .select((leftCols ++ payload).map(col): _*)
  }
}
