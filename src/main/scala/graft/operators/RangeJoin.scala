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

  /** Interval x interval OVERLAP join: pair every left interval
    * `[lStart, lEnd)` with every right interval `[rStart, rEnd)` that
    * overlaps it (half-open: `max(starts) < min(ends)`), optionally also
    * equi-matching `extraKeys`. Both sides replicate to every bucket they
    * touch; an overlapping pair therefore co-occurs in EVERY bucket their
    * overlap spans, and the emit-once guard keeps only the bucket that
    * contains the overlap's start (`greatest(lStart, rStart)`) — exact
    * single emission with no post-join distinct, the property that keeps
    * the output stream duplicate-free at any replication factor. Shuffle
    * is a plain hash partition on (bucket, extraKeys):
    * O((|L| + |R|) * spanFactor) rows; pick `bucketWidth` near the
    * typical interval length to keep spanFactor small. Left columns pass
    * through; right columns minus `extraKeys` pass through — alias
    * collisions are the caller's to avoid (rename before joining).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // [start, end) touches buckets bucket(start)..bucket(end - 1); empty
    // or inverted intervals (end <= start) replicate nowhere and so can
    // never pair — sequence() would throw on a descending range, so they
    // are filtered, not clamped
    def banded(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(s), bucketWidth),
        bucketOf(col(e) - 1, bucketWidth))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), Seq("__bucket") ++ extraKeys)
      .filter(greatest(col(lStart), col(rStart)) <
        least(col(lEnd), col(rEnd)))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(lStart), col(rStart)), bucketWidth))
      .drop("__bucket")
  }
}
