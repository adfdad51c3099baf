package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass multi-column table profiling — the "profile this table"
  * primitive every lakehouse ingestion pipeline runs before trusting a
  * new source (null rates, cardinalities, value ranges per column;
  * the reference's DQ tier checks single columns one rule at a time,
  * `/root/reference/src/pipeline.py:187-246` — this is the whole-table
  * sweep form of the same checks).
  *
  * Spark-first design: ONE `agg` carrying `count` / `count(distinct)` /
  * `min` / `max` for every profiled column. Catalyst's
  * RewriteDistinctAggregates plans the multi-column distincts through a
  * SINGLE Expand (one row per (row, distinct-group)) with two aggregate
  * phases — one scan of the table, one shuffle of partially-aggregated
  * groups, regardless of how many columns are profiled. The wide 1-row
  * result is then unpivoted plan-side (explode over per-column structs)
  * into the tidy (col_name, stats...) frame — no collect, no per-column
  * jobs, no second scan.
  *
  * Scale: Expand multiplies the scanned rows by (#distinct columns + 1)
  * before the partial aggregation collapses them — exact cardinalities
  * on a 100 TB table pay that fan-out once. When estimates suffice,
  * [[approxColumnProfile]] swaps `count(distinct)` for HLL
  * `approx_count_distinct` (relativeSD 0.02): no Expand at all, one
  * ordinary partial-agg pass whose shuffle carries a few-KB sketch per
  * column — the form to run fleet-wide.
  *
  * min/max are rendered to strings per type so mixed-type columns share
  * one schema, with engine-stable formats: integrals as plain digits,
  * fractionals via DECIMAL(18,2) (two fixed places — bitwise identical
  * across engines), timestamps as `yyyy-MM-dd HH:mm:ss`, dates as ISO,
  * strings as themselves.
  */
object Profile {

  private[operators] def fmt(dt: DataType, c: Column): Column = dt match {
    case StringType => c
    case DoubleType | FloatType | _: DecimalType =>
      c.cast(DecimalType(18, 2)).cast(StringType)
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast(StringType)
  }

  private def wideAggs(df: DataFrame, cols: Seq[String],
      distinctOf: Column => Column): (Column, Seq[Column]) = {
    val aggs = cols.flatMap { name =>
      val dt = df.schema(name).dataType
      val c = col(name)
      Seq(count(c).as(s"__${name}__nn"),
        distinctOf(c).as(s"__${name}__nd"),
        fmt(dt, min(c)).as(s"__${name}__min"),
        fmt(dt, max(c)).as(s"__${name}__max"))
    }
    (count(lit(1)).as("__n"), aggs)
  }

  private def unpivot(wide: DataFrame, cols: Seq[String],
      keep: Seq[String] = Nil): DataFrame =
    wide.select(keep.map(col) :+ explode(array(cols.map { name =>
        struct(lit(name).as("col_name"),
          col("__n").as("n_rows"),
          col(s"__${name}__nn").as("n_nonnull"),
          col(s"__${name}__nd").as("n_distinct"),
          col(s"__${name}__min").as("min_s"),
          col(s"__${name}__max").as("max_s"))
      }: _*)).as("p"): _*)
      // Column-API projection (not selectExpr): a keyword or spaced
      // group-column name must not hit the SQL parser
      .select(keep.map(col) ++ Seq("col_name", "n_rows", "n_nonnull",
        "n_distinct", "min_s", "max_s").map(f => col(s"p.$f")): _*)

  /** THE profile entry point. Defaults to the sketch form
    * ([[approxColumnProfile]]: HLL cardinalities, no Expand, fixed
    * memory) because that is the right default at production scale — on
    * a 100 TB table the exact multi-distinct Expand multiplies the scan
    * by (#columns + 1) for cardinalities whose last few percent almost
    * never change a decision. Pass `exact = true` to opt into
    * [[columnProfile]] when bit-exact distinct counts are the point
    * (oracle comparisons, small reference tables, compliance counts).
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false,
      relativeSD: Double = 0.02): DataFrame =
    if (exact) columnProfile(df, cols)
    else approxColumnProfile(df, cols, relativeSD)

  /** Exact profile: one row per column in `cols`, from ONE aggregation
    * pass (single Expand for all the distincts — see object scaladoc).
    * OPT-IN via `profile(df, cols, exact = true)` — a test-scale /
    * oracle tool; the fleet-wide default is the sketch form.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val (n, aggs) = wideAggs(df, cols, countDistinct(_))
    unpivot(df.agg(n, aggs: _*), cols)
  }

  /** Estimated-cardinality profile for tables where the exact form's
    * Expand fan-out is not worth paying: identical shape, `n_distinct`
    * from `approx_count_distinct` (HLL++, ~2% relative error), planned
    * as one ordinary partial-aggregated pass with NO row expansion.
    */
  def approxColumnProfile(df: DataFrame, cols: Seq[String],
      relativeSD: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val (n, aggs) = wideAggs(df, cols, approx_count_distinct(_, relativeSD))
    unpivot(df.agg(n, aggs: _*), cols)
  }

  /** Per-group profile — the per-source / per-partition quality sweep a
    * multi-source corpus runs to catch ONE bad feed (a crawl slice whose
    * null rate spiked, a vendor whose id cardinality collapsed) without
    * profiling each source in its own job. Same one-aggregation design
    * as [[columnProfile]] with `groupBy(groupCol)` in front: the
    * multi-column distincts still plan through a single Expand (now keyed
    * by group), so the cost is one scan + one shuffle of
    * partially-aggregated (group, distinct-slot) rows regardless of
    * column count. Output: one row per (group, column).
    *
    * Scale: group count is the new fan-in — fine for source/tenant/day
    * keys (≤ millions of groups); for a high-cardinality groupCol the
    * Expand multiplier applies per row exactly as in the ungrouped form,
    * and [[approxColumnProfile]]'s HLL swap composes the same way here.
    */
  def groupedColumnProfile(df: DataFrame, groupCol: String,
      cols: Seq[String]): DataFrame =
    groupedProfileWith(df, groupCol, cols, countDistinct(_))

  /** THE grouped-profile entry point — sketch cardinalities by default
    * (per-(group, column) state is one fixed HLL, the 100 TB default at
    * any group count), exact Expand form opt-in via `exact = true`;
    * mirrors [[profile]]/[[profileQuantiles]].
    */
  def profileGrouped(df: DataFrame, groupCol: String, cols: Seq[String],
      exact: Boolean = false, relativeSD: Double = 0.02): DataFrame =
    if (exact) groupedColumnProfile(df, groupCol, cols)
    else groupedProfileWith(df, groupCol, cols,
      approx_count_distinct(_, relativeSD))

  private def groupedProfileWith(df: DataFrame, groupCol: String,
      cols: Seq[String], distinctOf: Column => Column): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(!cols.contains(groupCol), "groupCol cannot also be profiled")
    val (n, aggs) = wideAggs(df, cols, distinctOf)
    unpivot(df.groupBy(groupCol).agg(n, aggs: _*), cols, Seq(groupCol))
  }

  /** Quantile profile — per-column percentile cuts (p25/p50/p75/p95 by
    * default), the "what does this column's distribution look like"
    * companion to [[columnProfile]]'s min/max. ONE aggregation carries
    * every column's `percentile(col, array(ps))`, so the cost is one
    * scan; arrays unpivot plan-side to tidy (col_name, p, value) rows.
    *
    * Scale: exact `percentile` holds a value→count map per column —
    * memory is bounded by each column's DISTINCT count, fine for
    * bounded-domain measures (quantities, prices, scores), wrong for
    * unbounded ones. [[approxQuantileProfile]] is the 100 TB form:
    * `approx_percentile` (KLL-style sketch, fixed memory at the chosen
    * `accuracy`), identical output shape.
    */
  def quantileProfile(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame =
    // Scale posture, explicit: exact `percentile` merges its value→count
    // map partials in ONE final task by construction (a single global
    // group) — safe precisely where this entry point is documented for
    // (verification-scale inputs / bounded domains, where the map is
    // distinct-count-bounded). The production path at 100 TB is
    // [[approxQuantileProfile]] via [[profileQuantiles]]'s default:
    // fixed-size sketch partials, same single final task but
    // sketch-merge cost, not value-map cost.
    quantiles(df, cols, ps,
      c => percentile(c, array(ps.map(lit): _*)))

  /** THE quantile entry point. Defaults to the sketch form
    * ([[approxQuantileProfile]]: KLL-style fixed memory at any
    * cardinality) — exact `percentile`'s value-map memory grows with
    * each column's distinct count, which is the wrong default for
    * unbounded measures at 100 TB. Pass `exact = true` for the
    * bit-exact interpolated cuts (oracle comparisons, bounded domains).
    */
  def profileQuantiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      exact: Boolean = false, accuracy: Int = 10000): DataFrame =
    if (exact) quantileProfile(df, cols, ps)
    else approxQuantileProfile(df, cols, ps, accuracy)

  /** Sketch-based quantile profile: same tidy shape as
    * [[quantileProfile]] with `approx_percentile` at `1/accuracy`
    * rank error — fixed executor memory regardless of cardinality.
    */
  def approxQuantileProfile(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      accuracy: Int = 10000): DataFrame =
    quantiles(df, cols, ps,
      c => approx_percentile(c, array(ps.map(lit): _*), lit(accuracy))
        .cast(ArrayType(DoubleType)))

  /** Per-group quantile profile — the distribution sweep keyed by a
    * source/tenant/day column ("did THIS feed's price distribution
    * shift?"), one row per (group, column, percentile). Same
    * one-aggregation design as [[quantileProfile]] with
    * `groupBy(groupCol)` in front; defaults to the sketch form (KLL-
    * style `approx_percentile` — per-group state is one fixed sketch
    * per column, the 100 TB default for any group cardinality), with
    * the exact value-map form opt-in (`exact = true`) for oracle-grade
    * cuts on bounded domains.
    */
  def groupedQuantileProfile(df: DataFrame, groupCol: String,
      cols: Seq[String], ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(!cols.contains(groupCol), "groupCol cannot also be profiled")
    val agg: Column => Column =
      if (exact) c => percentile(c, array(ps.map(lit): _*))
      else c => approx_percentile(c, array(ps.map(lit): _*),
        lit(accuracy)).cast(ArrayType(DoubleType))
    quantiles(df, cols, ps, agg, Seq(groupCol))
  }

  private def quantiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double], agg: Column => Column,
      keep: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must lie in [0,1]")
    // the percentile partials (value→count maps per column) build at
    // SCAN width; on a one-row-group input a GLOBAL profile runs in a
    // single task (x109 measured at parallelism ≈ 1: 2.8s taskSum over
    // 2.9s wall). Project to just the profiled/grouping columns, then
    // widen — the widening shuffle carries only those columns, and on a
    // many-row-group production scan it is a no-op (Tables.widenForKernel).
    // GROUPED profiles skip the widen: their finals already parallelize
    // by group, and 32x the per-group partial sketches measured as a net
    // regression (x122 +28% in the r20 interim bench).
    // round-robin, not hashed on the profiled values: a constant or
    // all-null profiled column — the exact broken-column case a profiler
    // exists to surface — would hash every row to one partition and pay
    // the shuffle while still building the partials serially
    val projected = df.select((keep ++ cols).map(col): _*)
    val slim =
      if (keep.isEmpty) graft.Tables.widenForKernelEven(projected)
      else projected
    val aggs = cols.map(c => agg(col(c).cast(DoubleType)).as(s"__$c"))
    val wide =
      if (keep.isEmpty) slim.agg(aggs.head, aggs.tail: _*)
      else slim.groupBy(keep.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // an all-null column's percentile aggregate is NULL, and exploding a
    // NULL array yields zero rows — the column would silently VANISH
    // from the report, hiding exactly the broken-column signal a profiler
    // exists to surface; substitute an all-null cut array so the column
    // reports (col_name, p, value = null) like any other
    val nullCuts = array(ps.map(_ => lit(null).cast(DoubleType)): _*)
    wide.select(keep.map(col) :+ explode(array(cols.map { name =>
        struct(lit(name).as("col_name"),
          coalesce(col(s"__$name"), nullCuts).as("qs"))
      }: _*)).as("c"): _*)
      .select(keep.map(col) ++ Seq(col("c.col_name").as("col_name"),
        posexplode(col("c.qs")).as(Seq("pos", "value"))): _*)
      .select(keep.map(col) ++ Seq(col("col_name"),
        element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        col("value")): _*)
  }

  /** Per-group IQR-fence outlier report (Tukey fences): for each group,
    * the exact quartiles of `valueCol`, the fences
    * `[q1 - k*IQR, q3 + k*IQR]` (k = 1.5 classically), and how many rows
    * fall outside — the robust "which feeds carry broken values" check
    * that mean/stddev-based z-scores get wrong on heavy-tailed data.
    *
    * Two passes by necessity (fences are data-dependent): (1) one
    * grouped aggregation computes both quartiles per group — exact
    * `percentile`, group-cardinality-bounded output; (2) the fences
    * frame broadcast-joins back and one more grouped aggregation counts
    * violations. Rows never shuffle on anything but the group key;
    * memory follows per-group distinct counts (the exact-percentile
    * trade documented on [[quantileProfile]]).
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k >= 0, "fence multiplier must be nonnegative")
    val v = col(valueCol).cast(DoubleType)
    val fences = df.groupBy(groupCol)
      .agg(percentile(v, array(lit(0.25), lit(0.75))).as("__q"))
      .select(col(groupCol).as("__grp"),
        element_at(col("__q"), 1).as("q1"),
        element_at(col("__q"), 2).as("q3"))
      .withColumn("lo_fence",
        col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi_fence",
        col("q3") + lit(k) * (col("q3") - col("q1")))
    // null-safe join: a NULL group is exactly the broken-feed signal
    // this report exists to surface — an equi-join would silently drop
    // every NULL-group row and the report would omit that group
    df.join(broadcast(fences), col(groupCol) <=> col("__grp"))
      .drop("__grp")
      .groupBy(groupCol)
      .agg(first(col("q1")).as("q1"), first(col("q3")).as("q3"),
        first(col("lo_fence")).as("lo_fence"),
        first(col("hi_fence")).as("hi_fence"),
        count(v).as("n"),
        sum(when(v < col("lo_fence") || v > col("hi_fence"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Equi-width histogram drift between two slices of a numeric column —
    * the distribution-monitoring primitive behind "did this quarter's
    * price curve / doc-length curve move?" (population-stability checks
    * on feature pipelines). Shared bin edges come from the GLOBAL
    * min/max over both slices (or caller-pinned `bounds` — the one-pass
    * form when the domain is known, which at 100 TB it should be;
    * out-of-domain values clamp into the edge bins, so every row is
    * counted); each slice's per-bin row fraction and the per-bin L1 gap
    * `|frac_a - frac_b|` come out per bin (total-variation distance is
    * half their sum — left to the caller so the output stays per-bin and
    * engine-exact: counts are exact longs, fractions single exact-count
    * divisions, edges `lo + bin*width` — no transcendentals, so results
    * are bit-reproducible across engines, unlike a PSI/KL variant).
    *
    * Scale: with `bounds` given, ONE scan of the tagged union and a
    * shuffle of ≤ nBins×partitions partial rows; without, one extra
    * min/max scan first (all map-side). Nothing row-sized ever
    * shuffles; the driver sees exactly two doubles.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
      nBins: Int, bounds: Option[(Double, Double)] = None): DataFrame = {
    require(nBins >= 2, "need at least two bins")
    // NaN has no position on the value axis: excluded like NULL (it
    // previously poisoned derived bounds into a confusing degenerate-
    // range failure, and under pinned bounds floor(NaN)->0 silently
    // miscounted every NaN row into bin 0)
    def clean(df: DataFrame) = df
      .select(col(valueCol).cast(DoubleType).as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val tagged = clean(a).withColumn("__s", lit(0))
      .unionAll(clean(b).withColumn("__s", lit(1)))
    val (lo, hi) = bounds.getOrElse {
      val r = tagged.agg(min(col("__v")), max(col("__v"))).head()
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "histogramDrift: no non-null values in either slice")
      (r.getDouble(0), r.getDouble(1))
    }
    require(hi > lo, s"degenerate value range [$lo,$hi]")
    val width = (hi - lo) / nBins
    // clamp BOTH edges: with pinned bounds, out-of-domain stragglers
    // land in bin 0 / nBins-1 instead of escaping the 0..nBins-1
    // contract (derived bounds never produce out-of-range values)
    val bin = greatest(lit(0L),
      least(floor((col("__v") - lit(lo)) / lit(width)),
        lit((nBins - 1).toLong))).cast(IntegerType)
    val counts = tagged.groupBy(bin.as("bin")).agg(
      sum(when(col("__s") === 0, 1L).otherwise(0L)).as("count_a"),
      sum(when(col("__s") === 1, 1L).otherwise(0L)).as("count_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("frac_a",
        col("count_a").cast(DoubleType) / sum("count_a").over(w))
      .withColumn("frac_b",
        col("count_b").cast(DoubleType) / sum("count_b").over(w))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        col("count_a"), col("count_b"), col("frac_a"), col("frac_b"),
        abs(col("frac_a") - col("frac_b")).as("l1"))
  }
}
