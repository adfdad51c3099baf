package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch range (interval) joins — the operator family Spark expresses only
  * as a BroadcastNestedLoop/cartesian + filter, which is quadratic work the
  * moment neither side broadcasts. Both entry points reduce the range
  * predicate to a bucketized EQUI-join: buckets of width `bucketWidth`
  * tile the numeric axis, each interval replicates to every bucket it
  * overlaps, each point probes exactly its own bucket, and the exact
  * predicate re-filters inside the matched bucket. A (point, interval)
  * match shares exactly one bucket — the point's — so no post-join dedup
  * is needed, and the shuffle is a plain hash partition on
  * (bucket, extraKeys): O(points + intervals * spanFactor) rows, never
  * |points| x |intervals|. This is the bin-size formulation production
  * engines use for range-join acceleration; `bucketWidth` is that bin
  * size, and spanFactor = ceil(len/bucketWidth)+1 is the replication a
  * caller pays for intervals much longer than the bucket — pick
  * bucketWidth near the typical interval length.
  *
  * Keys are LONGS (epoch micros, positions, prices-in-cents): numeric and
  * engine-neutral; callers convert timestamps with `unix_micros`.
  * Floor-division buckets come from `pmod`, exact long arithmetic that is
  * correct for negative coordinates under ANSI (no double rounding, no
  * toward-zero truncation).
  */
object RangeJoin {

  // (c - pmod) is an exact multiple of w, so the double division rounds to
  // the integer bucket exactly (bucket counts sit far below 2^53)
  private def bucketOf(c: org.apache.spark.sql.Column, w: Long) =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Inner-join `points` to every `intervals` row whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`,
    * optionally also equi-matching `extraKeys` (present on both sides —
    * e.g. a user/tenant id, which further prunes buckets). Output carries
    * the points columns plus the intervals columns minus its join keys.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    val iv = intervals
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol), bucketWidth),
        bucketOf(col(endCol), bucketWidth))))
    p.join(iv, Seq("__bucket") ++ extraKeys)
      .filter(col(startCol) <= col(pointCol) &&
        col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Tolerance band join: pair every left row with every right row whose
    * `rightCol` lies within `tolerance` of `leftCol` (|l - r| <= tol),
    * optionally also equi-matching `extraKeys` — "events of the same user
    * within N minutes of each other". Implemented as [[pointInInterval]]
    * with right-side intervals [r - tol, r + tol] and bucket width
    * 2*tolerance, so each right row replicates to at most 2 buckets.
    */
  def bandJoin(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, tolerance: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(tolerance >= 0, "tolerance must be nonnegative")
    val iv = right
      .withColumn("__start", col(rightCol) - tolerance)
      .withColumn("__end", col(rightCol) + tolerance)
    pointInInterval(left, iv, leftCol, "__start", "__end",
      bucketWidth = math.max(2 * tolerance, 1L), extraKeys)
      .drop("__start", "__end")
  }
}
