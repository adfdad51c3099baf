package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * bucketWidth near the typical interval length ([[bucketWidthFor]]
  * derives one from a length quantile).
  *
  * Degenerate-span guard: without one, a single interval spanning the
  * whole axis replicates to axis/bucketWidth buckets (a sequence() overflow
  * long before it is a shuffle problem) and every bucket it lands in
  * degrades toward all-pairs. Intervals spanning more than
  * `maxSpanBuckets` buckets therefore route to a salted LONG-TAIL
  * rendezvous instead of the axis tiling: the long interval replicates to
  * a fixed set of `numSalts` salt keys (bounded, axis-independent) and
  * every row of the OTHER side emits exactly one salt probe row
  * (+1 row — the whole cost of the guard when no long interval exists).
  * Each (long interval, other row) pair meets in exactly one salt bucket,
  * so the exactly-once emission property is preserved without any
  * post-join distinct, the work of long-interval pairs spreads across all
  * salt partitions instead of one hot bucket, and the result is EXACT —
  * unlike the LSH family's capped-collect guard, a join may not drop
  * over-cap members, so the long tail is rerouted, never truncated.
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
  private def bucketOf(c: Column, w: Long) =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  // salt-key fan-out of the long-tail rendezvous: enough keys to spread
  // a long interval's pair work across the shuffle, bounded regardless of
  // axis extent. Perf knob only — results are salt-count-independent.
  private def numSalts(df: DataFrame): Long =
    try math.max(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, 16).toLong
    catch { case _: NumberFormatException => 64L }

  // composite rendezvous key carried as a struct through the explode,
  // then FLATTENED to two plain join columns (__k int, __b long): a
  // two-column hash join codegens tighter than struct equality, and the
  // int kind column compresses to nothing in the exchange
  private def key(kind: Int, b: Column): Column =
    struct(lit(kind).as("k"), b.as("b"))

  private def flatten(df: DataFrame): DataFrame = df
    .withColumn("__k", col("__key").getField("k"))
    .withColumn("__b", col("__key").getField("b"))
    .drop("__key")

  /** Derive a bucket width from the data: the `quantile` (default p75)
    * interval length, so the TYPICAL interval replicates to ~1–2 buckets
    * and only the tail pays more (and past `maxSpanBuckets`, the salted
    * long-tail route caps even that). ONE bounded driver job
    * (approxQuantile over the length column — Greenwald-Khanna, a few KB
    * of sketch); call once and reuse, and persist `intervals` first if it
    * is an expensive derived frame.
    */
  def bucketWidthFor(intervals: DataFrame, startCol: String, endCol: String,
      quantile: Double = 0.75): Long = {
    require(quantile > 0 && quantile <= 1, "quantile must be in (0, 1]")
    val q = intervals
      .select((col(endCol) - col(startCol)).cast("double").as("__len"))
      .filter(col("__len") > 0)
      .stat.approxQuantile("__len", Array(quantile), 0.01)
    if (q.isEmpty || q(0).isNaN || q(0) < 1.0) 1L else math.round(q(0))
  }

  /** Inner-join `points` to every `intervals` row whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`,
    * optionally also equi-matching `extraKeys` (present on both sides —
    * e.g. a user/tenant id, which further prunes buckets). Output carries
    * the points columns plus the intervals columns minus its join keys.
    * Intervals spanning more than `maxSpanBuckets` buckets take the
    * salted long-tail route (see object doc) — exact, bounded
    * replication; each point pays one extra probe row for the guard.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSpanBuckets > 0, "maxSpanBuckets must be positive")
    val salts = numSalts(points)
    // kind 0 = axis bucket; kind 1 = long-tail salt rendezvous. A point
    // sits in exactly one bucket of each kind, a short interval only in
    // kind-0 buckets, a long interval in every kind-1 salt — so every
    // matching pair co-occurs in exactly one key and no dedup is needed.
    val p = flatten(points.withColumn("__key", explode(array(
      key(0, bucketOf(col(pointCol), bucketWidth)),
      key(1, pmod(xxhash64(col(pointCol)), lit(salts)))))))
    // an INVERTED interval (end < start) can never satisfy the inclusive
    // containment predicate, so it is FILTERED, not routed: sending it
    // down the salt arm would pair it with every point's salt probe
    // before the exact filter rejected it — |points| x |inverted| wasted
    // joined rows — and letting it reach sequence() would build a huge
    // descending tiling. NULL-bounded rows drop with it (NULL bounds
    // never satisfy the containment predicate either). Same guard as
    // the optimizer twin RangeJoinRewrite's point shape.
    val proper = intervals.filter(col(endCol) >= col(startCol))
    val sb = bucketOf(col(startCol), bucketWidth)
    val eb = bucketOf(col(endCol), bucketWidth)
    // when() evaluates one branch per row, so the long arm never builds
    // the axis tiling (spans are non-negative after the filter above)
    val iv = flatten(proper.withColumn("__key", explode(
      when(eb - sb < lit(maxSpanBuckets.toLong),
        transform(sequence(sb, eb), b => key(0, b)))
      .otherwise(
        transform(sequence(lit(0L), lit(salts - 1L)), s => key(1, s))))))
    p.join(iv, Seq("__k", "__b") ++ extraKeys)
      .filter(col(startCol) <= col(pointCol) &&
        col(pointCol) <= col(endCol))
      .drop("__k", "__b")
  }

  /** LEFT OUTER [[pointInInterval]]: every `points` row appears — paired
    * with each covering interval when one exists, null-extended on the
    * interval columns when none does. Implemented WITHOUT row ids: the
    * unmatched set is `points` LEFT ANTI joined (null-safe, by VALUE over
    * the full points tuple) against the distinct point-tuples of the
    * matched pairs. Identical point rows have identical match sets, so
    * value-based complementation IS multiset left-outer semantics — and
    * unlike a `monotonically_increasing_id` tag, it is deterministic
    * under re-execution of the two branches (the physical plan reuses
    * the matched join's exchanges, so the second pass re-runs only the
    * post-shuffle stages).
    *
    * Scale shape: the anti side shuffles distinct MATCHED point tuples
    * (bounded by |points|) plus the points themselves — two hash joins,
    * no nested loop anywhere. If the points carry wide payload columns,
    * project them to a key + payload split before calling.
    */
  def pointInIntervalLeftOuter(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    // the value-based complement must resolve the points tuple in the
    // joined frame by NAME — shared non-key names would be ambiguous
    // there (the inner join tolerates them; this wrapper cannot)
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(shared.isEmpty,
      "pointInIntervalLeftOuter: points and intervals share non-key " +
        s"column(s) ${shared.mkString(", ")} — rename before joining")
    val matched = pointInInterval(points, intervals, pointCol, startCol,
      endCol, bucketWidth, extraKeys, maxSpanBuckets)
    matched.unionAll(complementExtend(matched, points, intervals))
  }

  /** Shared value-based complement of an inner range-join result:
    * `preserved` rows whose full tuple is absent from `matched`'s
    * preserved-tuples (null-safe anti join against the DISTINCT tuples),
    * null-extended on `other`'s columns to `matched`'s schema. Identical
    * preserved rows have identical match sets, so this IS multiset outer
    * semantics without row ids; both outer wrappers build on it.
    */
  private def complementExtend(matched: DataFrame, preserved: DataFrame,
      other: DataFrame): DataFrame = {
    val pCols = preserved.columns.toSeq
    val oTypes = other.schema.map(f => f.name -> f.dataType).toMap
    val anti = distinctValueJoin(preserved, matched, "left_anti")
    anti.select(matched.columns.toSeq.map { c =>
      if (pCols.contains(c)) col(c)
      else lit(null).cast(oTypes(c)).as(c)
    }: _*)
  }

  /** `preserved` semi/anti-joined — null-safe, by VALUE over its full
    * tuple — against the DISTINCT preserved-tuples of `matched`. The
    * value-membership core every outer/semi/anti wrapper builds on:
    * identical preserved rows have identical match sets, so value
    * membership IS multiset semantics without row ids.
    */
  private def distinctValueJoin(preserved: DataFrame, matched: DataFrame,
      joinType: String): DataFrame = {
    val pCols = preserved.columns.toSeq
    val l = preserved.alias("__rj_l")
    val m = matched.select(pCols.map(col): _*).distinct().alias("__rj_m")
    // backtick-quote each name (with embedded backticks doubled): a
    // legal column name containing a dot would otherwise parse as a
    // nested-field path and misresolve the join keys
    def q(c: String) = "`" + c.replace("`", "``") + "`"
    l.join(m,
      pCols.map(c => col(s"__rj_l.${q(c)}") <=> col(s"__rj_m.${q(c)}"))
        .reduce(_ && _), joinType)
  }

  private def semiAntiShape(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String], maxSpanBuckets: Int,
      joinType: String): DataFrame = {
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(shared.isEmpty,
      "pointInIntervalLeftSemi/Anti: points and intervals share non-key " +
        s"column(s) ${shared.mkString(", ")} — rename before joining")
    // membership needs only the interval BOUNDS (+ equi keys): slim the
    // replicating side to them so the bucketized shuffle never carries
    // interval payload columns
    val slim = intervals
      .select((Seq(startCol, endCol) ++ extraKeys).map(col): _*)
    val matched = pointInInterval(points, slim, pointCol, startCol,
      endCol, bucketWidth, extraKeys, maxSpanBuckets)
    distinctValueJoin(points, matched, joinType)
  }

  /** LEFT SEMI [[pointInInterval]] — the `EXISTS` interval form, "points
    * WITH a covering interval": every `points` row with at least one
    * covering `[startCol, endCol]` interval (and matching `extraKeys`),
    * each exactly once, points columns only. Built as the bucketized
    * inner join against the BOUNDS-ONLY projection of the interval side,
    * then a null-safe value semi-join of `points` against the distinct
    * matched point-tuples — two hash joins, no nested loop, no row ids.
    */
  def pointInIntervalLeftSemi(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame =
    semiAntiShape(points, intervals, pointCol, startCol, endCol,
      bucketWidth, extraKeys, maxSpanBuckets, "left_semi")

  /** LEFT ANTI [[pointInInterval]] — the `NOT EXISTS` interval form,
    * "points WITHOUT a covering interval": the interval twin of the
    * reference's orphan check (fact rows with no matching dimension —
    * /root/reference/src/pipeline.py:231-235 — generalized from equality
    * to interval coverage). Every `points` row no interval covers, each
    * exactly once; NULL-axis points can never be covered, so they are
    * KEPT, exactly as SQL `NOT EXISTS` keeps them. Same two-hash-join
    * construction as [[pointInIntervalLeftSemi]].
    */
  def pointInIntervalLeftAnti(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame =
    semiAntiShape(points, intervals, pointCol, startCol, endCol,
      bucketWidth, extraKeys, maxSpanBuckets, "left_anti")

  /** FULL OUTER [[pointInInterval]]: every `points` row AND every
    * `intervals` row appears — matched pairs once each, unmatched points
    * null-extended on the interval columns, unmatched intervals
    * (including inverted/NULL-bounded ones, which can never match)
    * null-extended on the point columns. Same value-based complement
    * construction as [[pointInIntervalLeftOuter]], applied to BOTH
    * sides against the one matched core — three hash-join branches, no
    * nested loop, no row ids.
    */
  def pointInIntervalFullOuter(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(shared.isEmpty,
      "pointInIntervalFullOuter: points and intervals share non-key " +
        s"column(s) ${shared.mkString(", ")} — rename before joining")
    val matched = pointInInterval(points, intervals, pointCol, startCol,
      endCol, bucketWidth, extraKeys, maxSpanBuckets)
    matched
      .unionAll(complementExtend(matched, points, intervals))
      .unionAll(complementExtend(matched, intervals, points))
  }

  /** Tolerance band join: pair every left row with every right row whose
    * `rightCol` lies within `tolerance` of `leftCol` (|l - r| <= tol),
    * optionally also equi-matching `extraKeys` — "events of the same user
    * within N minutes of each other". Implemented as [[pointInInterval]]
    * with right-side intervals [r - tol, r + tol] and bucket width
    * 2*tolerance, so each right row replicates to at most 2 buckets
    * (the long-tail guard never fires here by construction).
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

  /** LEFT OUTER [[bandJoin]]: every left row appears — paired with each
    * right row within `tolerance`, null-extended when none is. The
    * right-side derived interval columns are dropped before the
    * complementation, so the anti join keys on the LEFT tuple only
    * (same value-based construction as [[pointInIntervalLeftOuter]]).
    */
  def bandJoinLeftOuter(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, tolerance: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(tolerance >= 0, "tolerance must be nonnegative")
    val iv = right
      .withColumn("__start", col(rightCol) - tolerance)
      .withColumn("__end", col(rightCol) + tolerance)
    pointInIntervalLeftOuter(left, iv, leftCol, "__start", "__end",
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
    * typical interval length ([[bucketWidthFor]]) to keep spanFactor
    * small. Left columns pass through; right columns minus `extraKeys`
    * pass through — alias collisions are the caller's to avoid (rename
    * before joining).
    *
    * Long-tail guard (see object doc): an interval spanning more than
    * `maxSpanBuckets` buckets skips the axis tiling. Kind-1 keys pair
    * LONG-left with EVERY right row (long-left replicates to all salts;
    * every right row probes its one salt); kind-2 keys pair LONG-right
    * with SHORT-left symmetrically (long-right × long-left is already
    * covered by kind 1, so long-right probes kind 1 but never kind 2 from
    * the left). The three key kinds partition the pair space, each pair
    * meets in exactly one key, and the kind-0 emit-once bucket guard
    * applies only to the tiled pairs — exactness and single emission hold
    * at ANY mix of spans.
    */
  /** LEFT OUTER [[intervalOverlap]]: every left interval appears —
    * paired with each overlapping right interval, null-extended when
    * none overlaps (inverted/empty left intervals can never pair under
    * the half-open predicate, so they surface null-extended). Same
    * value-based complement as [[pointInIntervalLeftOuter]].
    */
  def intervalOverlapLeftOuter(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    requireNoSharedNames(left, right, extraKeys, "intervalOverlapLeftOuter")
    val matched = intervalOverlap(left, right, lStart, lEnd, rStart, rEnd,
      bucketWidth, extraKeys, maxSpanBuckets)
    matched.unionAll(complementExtend(matched, left, right))
  }

  /** RIGHT OUTER [[intervalOverlap]]: every right interval appears —
    * paired with each overlapping left interval, null-extended when
    * none overlaps. The symmetric flip of
    * [[intervalOverlapLeftOuter]]'s value-based complement (the matrix
    * completion: the optimizer twin already rewrote this orientation).
    */
  def intervalOverlapRightOuter(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    requireNoSharedNames(left, right, extraKeys,
      "intervalOverlapRightOuter")
    val matched = intervalOverlap(left, right, lStart, lEnd, rStart, rEnd,
      bucketWidth, extraKeys, maxSpanBuckets)
    matched.unionAll(complementExtend(matched, right, left))
  }

  /** FULL OUTER [[intervalOverlap]]: both unmatched sides surface
    * null-extended around the exactly-once matched core.
    */
  def intervalOverlapFullOuter(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    requireNoSharedNames(left, right, extraKeys, "intervalOverlapFullOuter")
    val matched = intervalOverlap(left, right, lStart, lEnd, rStart, rEnd,
      bucketWidth, extraKeys, maxSpanBuckets)
    matched
      .unionAll(complementExtend(matched, left, right))
      .unionAll(complementExtend(matched, right, left))
  }

  /** LEFT SEMI / LEFT ANTI [[intervalOverlap]] — "left intervals WITH /
    * WITHOUT an overlapping right interval", each exactly once. The
    * replicating right side slims to its two bounds (+ equi keys)
    * before the bucketized shuffle; membership resolves by null-safe
    * value against the distinct matched left-tuples, exactly as the
    * point-shape forms do.
    */
  def intervalOverlapLeftSemi(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame =
    overlapSemiAnti(left, right, lStart, lEnd, rStart, rEnd, bucketWidth,
      extraKeys, maxSpanBuckets, "left_semi")

  def intervalOverlapLeftAnti(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame =
    overlapSemiAnti(left, right, lStart, lEnd, rStart, rEnd, bucketWidth,
      extraKeys, maxSpanBuckets, "left_anti")

  private def overlapSemiAnti(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String], maxSpanBuckets: Int,
      joinType: String): DataFrame = {
    requireNoSharedNames(left, right, extraKeys,
      "intervalOverlapLeftSemi/Anti")
    val slim = right.select((Seq(rStart, rEnd) ++ extraKeys).map(col): _*)
    val matched = intervalOverlap(left, slim, lStart, lEnd, rStart, rEnd,
      bucketWidth, extraKeys, maxSpanBuckets)
    distinctValueJoin(left, matched, joinType)
  }

  private def requireNoSharedNames(a: DataFrame, b: DataFrame,
      extraKeys: Seq[String], who: String): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet) -- extraKeys
    require(shared.isEmpty,
      s"$who: sides share non-key column(s) ${shared.mkString(", ")} — " +
        "rename before joining")
  }

  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, extraKeys: Seq[String] = Nil,
      maxSpanBuckets: Int = 256): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSpanBuckets > 0, "maxSpanBuckets must be positive")
    val salts = numSalts(left)
    def allSalts(kind: Int) =
      transform(sequence(lit(0L), lit(salts - 1L)), s => key(kind, s))
    def saltOf(s: String, e: String) =
      pmod(xxhash64(col(s), col(e)), lit(salts))
    // [start, end) touches buckets bucket(start)..bucket(end - 1); empty
    // or inverted intervals (end <= start) replicate nowhere and so can
    // never pair — sequence() would throw on a descending range, so they
    // are filtered, not clamped
    def keyed(df: DataFrame, s: String, e: String, idxKind: Int,
        probeKind: Int) = {
      val sb = bucketOf(col(s), bucketWidth)
      val eb = bucketOf(col(e) - 1, bucketWidth)
      val shortKeys = concat(
        transform(sequence(sb, eb), b => key(0, b)),
        array(key(probeKind, saltOf(s, e))))
      // the left side indexes at kind 1 only (its pairs with ALL right
      // rows ride right's kind-1 probes); the right side indexes at kind
      // 2 AND probes kind 1, so long×long lands exactly once — in kind 1
      val longKeys =
        if (idxKind == 1) allSalts(1)
        else concat(allSalts(2), array(key(1, saltOf(s, e))))
      flatten(df.filter(col(e) > col(s))
        .withColumn("__key", explode(
          when(eb - sb < lit(maxSpanBuckets.toLong), shortKeys)
            .otherwise(longKeys))))
    }
    val ovStart = greatest(col(lStart), col(rStart))
    keyed(left, lStart, lEnd, idxKind = 1, probeKind = 2)
      .join(keyed(right, rStart, rEnd, idxKind = 2, probeKind = 1),
        Seq("__k", "__b") ++ extraKeys)
      .filter(ovStart < least(col(lEnd), col(rEnd)))
      .filter(col("__k") =!= 0 ||
        col("__b") === bucketOf(ovStart, bucketWidth))
      .drop("__k", "__b")
  }
}
