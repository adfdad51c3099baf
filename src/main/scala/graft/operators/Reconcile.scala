package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table reconciliation — the "did my rewritten pipeline produce the same
  * table?" primitives a migration or backfill runs before cutting over
  * (the reference's DQ tier checks one table against RULES,
  * `/root/reference/src/pipeline.py:187-246`; these check one table
  * against ANOTHER TABLE).
  *
  * Two tiers, matching how reconciliation is actually run:
  *
  *  - [[diffSummary]]: the exact keyed diff — a FULL OUTER join on the
  *    key columns, classifying every key as only-in-A / only-in-B /
  *    present-in-both, and counting, per payload column, the both-present
  *    rows whose values differ (null-safe). One shuffle per side (hash on
  *    the key) + a scalar aggregation; payload never re-shuffles after
  *    the join. This is the form that NAMES what differs.
  *  - [[columnChecksums]]: the cheap no-join fingerprint — per column,
  *    an order-independent multiset checksum (sum of a deterministic
  *    per-value encoding) computed in ONE aggregation pass with no
  *    shuffle beyond the scalar agg. Run it on both tables (fleet-wide,
  *    100 TB form), compare the tiny outputs; only on mismatch pay the
  *    keyed diff. The encoding is deliberately engine-portable (the
  *    DuckDB oracle replays it verbatim): numerics canonicalize exactly
  *    (doubles via DECIMAL(18,2) cents, dates via epoch day, timestamps
  *    via epoch micros) and strings fold `(h*31 + codepoint) % 1000003`
  *    over their code points — the [[Dsir]] fold, computed by the native
  *    O(len) kernel [[graft.functions.expr.CodepointFoldExpr]] (both
  *    engines index strings by code point, so the fold is portable over
  *    the full Unicode range).
  *
  * Keys are expected unique per table (reconciliation presumes a key);
  * duplicate keys join multiplicatively, as in any keyed diff.
  */
object Reconcile {

  // payload columns are renamed to __a_/__b_ prefixes, but KEY columns
  // keep their names — a key literally named after a presence marker
  // would be clobbered by withColumn("__pa"/"__pb", lit(1)), silently
  // degrading the keyed join and every membership count; refuse it
  private def guardKeyNames(keys: Seq[String]): Unit = {
    val clash = keys.toSet.intersect(Set("__pa", "__pb"))
    require(clash.isEmpty,
      s"reconcile: key column name(s) ${clash.mkString(", ")} collide " +
        "with the internal presence markers — rename before reconciling")
  }

  /** Keyed full-outer diff of two same-schema frames: one tidy row per
    * metric — `only_in_a` / `only_in_b` / `in_both` key counts, then
    * `diff:<col>` = both-present rows where that payload column differs
    * (null-safe inequality). Equal frames yield all-zero diffs.
    */
  def diffSummary(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    guardKeyNames(keys)
    require(a.columns.sorted.sameElements(b.columns.sorted),
      "frames must share a schema; reconcile columns, not shapes")
    val payload = a.columns.filterNot(keys.contains).toSeq
    val fa = a.select(keys.map(col) ++
      payload.map(c => col(c).as(s"__a_$c")): _*).withColumn("__pa", lit(1))
    val fb = b.select(keys.map(col) ++
      payload.map(c => col(c).as(s"__b_$c")): _*).withColumn("__pb", lit(1))
    val j = fa.join(fb, keys, "full_outer")
    val both = col("__pa").isNotNull && col("__pb").isNotNull
    def ct(c: Column) = sum(when(c, 1L).otherwise(0L))
    val aggs =
      Seq(ct(col("__pb").isNull).as("m0_only_in_a"),
        ct(col("__pa").isNull).as("m1_only_in_b"),
        ct(both).as("m2_in_both")) ++
      payload.zipWithIndex.map { case (c, i) =>
        ct(both && !(col(s"__a_$c") <=> col(s"__b_$c"))).as(s"d${i}_$c")
      }
    val names = Seq("only_in_a", "only_in_b", "in_both") ++
      payload.map(c => s"diff:$c")
    val wide = j.agg(aggs.head, aggs.tail: _*)
    val fields = wide.columns
    wide.select(explode(array(names.zip(fields).map { case (n, f) =>
        struct(lit(n).as("metric"), col(f).as("n"))
      }: _*)).as("m"))
      .select("m.*")
  }

  /** The step after [[diffSummary]] names a differing metric: up to
    * `maxPerCol` concrete examples per payload column — the key, both
    * values — PLUS up to `maxPerCol` example keys for each membership
    * metric (`only_in_a` / `only_in_b`, values null: the row is missing
    * on the other side), all deterministically chosen (smallest
    * rendered key first) so reruns and engines agree. Values render
    * through the same per-type engine-stable formats as the profiler
    * (DECIMAL(18,2) fractionals, second-precision timestamps), so the
    * DuckDB oracle replays them verbatim.
    *
    * Scale shape: the same single full-outer hash join as
    * [[diffSummary]]; only DIFFERING rows survive the filter
    * (diff-rate-bounded, tiny when reconciliation is almost passing —
    * the case this report exists for), and the per-column top-N plans
    * with a `WindowGroupLimit` pre-limit, so each input partition
    * forwards at most `maxPerCol` rows per column before the single
    * window exchange. Output ≤ columns × maxPerCol rows.
    */
  def diffExamples(a: DataFrame, b: DataFrame, keys: Seq[String],
      maxPerCol: Int = 5): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    guardKeyNames(keys)
    require(maxPerCol > 0, "maxPerCol must be positive")
    require(a.columns.sorted.sameElements(b.columns.sorted),
      "frames must share a schema; reconcile columns, not shapes")
    val payload = a.columns.filterNot(keys.contains).toSeq
    // the membership metrics share the col_name namespace (and thus the
    // per-column top-N window partitions) with the payload columns — a
    // payload column literally named only_in_a/only_in_b would silently
    // truncate against its homonym metric inside maxPerCol, so refuse it
    val clash = payload.toSet.intersect(Set("only_in_a", "only_in_b"))
    require(clash.isEmpty,
      s"diffExamples: payload column name(s) ${clash.mkString(", ")} " +
        "collide with the membership metric namespace — rename the " +
        "column(s) before reconciling")
    val types = a.schema.map(f => f.name -> f.dataType).toMap
    val fa = a.select(keys.map(col) ++
      payload.map(c => col(c).as(s"__a_$c")): _*).withColumn("__pa", lit(1))
    val fb = b.select(keys.map(col) ++
      payload.map(c => col(c).as(s"__b_$c")): _*).withColumn("__pb", lit(1))
    val keyS = concat_ws("|",
      keys.map(c => Profile.fmt(types(c), col(c))): _*)
    val j = fa.join(fb, keys, "full_outer")
    // MEMBERSHIP examples: concrete keys behind diffSummary's
    // only_in_a / only_in_b counts (values null — the whole row is
    // missing on the other side), same per-metric top-N discipline.
    // A key-only frame yields ONLY these (no columns whose values
    // could differ).
    def onlyEx(metric: String, absent: Column) = j.filter(absent.isNull)
      .select(lit(metric).as("col_name"), keyS.as("key_s"),
        lit(null).cast(StringType).as("a_value"),
        lit(null).cast(StringType).as("b_value"))
    val membership = onlyEx("only_in_a", col("__pb"))
      .unionAll(onlyEx("only_in_b", col("__pa")))
    val ex =
      if (payload.isEmpty) membership
      else j
        .filter(col("__pa").isNotNull && col("__pb").isNotNull)
        .select(keyS.as("key_s"), explode(array(payload.map { c =>
          struct(lit(c).as("col_name"),
            (!(col(s"__a_$c") <=> col(s"__b_$c"))).as("differs"),
            Profile.fmt(types(c), col(s"__a_$c")).as("a_value"),
            Profile.fmt(types(c), col(s"__b_$c")).as("b_value"))
        }: _*)).as("d"))
        .filter(col("d.differs"))
        .select(col("d.col_name").as("col_name"), col("key_s"),
          col("d.a_value").as("a_value"), col("d.b_value").as("b_value"))
        .unionAll(membership)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name").orderBy("key_s")
    ex.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerCol)
      .drop("__rn")
  }

  /** Fold modulus shared with [[Dsir.HashMod]]: prime, small enough that
    * `h*31 + codepoint` never nears Long overflow under ANSI.
    */
  private val M = Dsir.HashMod

  // engine-portable per-value encoding into [0, M): exact numeric
  // canonicalizations; strings via the native O(len) code-point fold
  // ([[graft.functions.expr.CodepointFoldExpr]], whose modulus IS M).
  // NULLs encode to null and are skipped by sum().
  // All moduli are pmod (non-negative) — the canonical form; SQL replays
  // with %-semantics that keep the dividend's sign must wrap as
  // ((e % M) + M) % M. Fractionals must fit DECIMAL(18,2) (|v| < 1e16,
  // finite): the range is ENFORCED with raise_error rather than left to
  // the cast, because only ANSI mode makes the overflow loud — ANSI-off
  // casts out-of-range (and NaN/Inf) values to NULL, and sum() would
  // silently drop them while n_nonnull still counted them: a corrupted
  // fingerprint with no error.
  private def encode(dt: DataType, c: Column): Column = dt match {
    case StringType =>
      graft.functions.expr.CodepointFoldExpr(c)
    // binary floats canonicalize at 2dp via the pure-IEEE
    // floor(v*100 + 0.5): a decimal CAST of a binary float is not
    // engine-portable (Spark rounds the shortest decimal string, DuckDB
    // the binary value — they disagree when the shortest form ends
    // exactly in ...5 at 2dp, the same divergence x126's array elements
    // measured at 6dp). True DECIMAL inputs below keep exact decimal
    // arithmetic — no binary ambiguity exists there.
    case DoubleType | FloatType =>
      val d = c.cast(DoubleType)
      val guarded = when(c.isNull, lit(null).cast(DoubleType))
        .when(abs(d) < lit(1e16d), d)
        .otherwise(raise_error(concat(
          lit("columnChecksums: value outside the 2dp canonicalization " +
            "range (|v| < 1e16, finite): "),
          c.cast(StringType))))
      pmod(floor(guarded * lit(100d) + lit(0.5d)).cast(LongType), lit(M))
    case _: DecimalType =>
      val guarded = when(c.isNull, lit(null).cast(DecimalType(18, 2)))
        .when(abs(c.cast(DoubleType)) < lit(1e16d),
          c.cast(DecimalType(18, 2)))
        .otherwise(raise_error(concat(
          lit("columnChecksums: value outside the DECIMAL(18,2) " +
            "canonicalization range (|v| < 1e16, finite): "),
          c.cast(StringType))))
      pmod((guarded * lit(100)).cast(LongType), lit(M))
    case DateType => pmod(unix_date(c).cast(LongType), lit(M))
    case TimestampType => pmod(unix_micros(c), lit(M))
    // NTZ carries the same wall-clock micros; the UTC session cast is a
    // no-op on the instant and satisfies unix_micros' input type
    case TimestampNTZType =>
      pmod(unix_micros(c.cast(TimestampType)), lit(M))
    case BooleanType => c.cast(LongType)
    case ByteType | ShortType | IntegerType | LongType =>
      pmod(c.cast(LongType), lit(M))
    // ARRAYS (vector/embedding tables): an ORDER-DEPENDENT fold of the
    // elements' encodings — arrays are ordered values, so [a,b] and
    // [b,a] must fingerprint differently — from init 1, NOT 0: with a
    // zero init, a leading NULL element (folded as the sentinel M ≡ 0)
    // would collide with the empty array. NULL elements fold as M (no
    // real encoding reaches M, so a null slot never collides with a
    // value); empty arrays encode to 1; a NULL array encodes to null
    // (skipped by sum, counted out of n_nonnull). SQL replays prepend
    // the init: `list_reduce(list_concat([1], encs), fold)` — portable
    // to list_reduce implementations without an init parameter.
    // Fractional ELEMENTS canonicalize at 6dp micro-units rather than
    // the top-level 2dp money convention: vector components live near
    // zero, where cents would collapse everything (|v| < 1e12 enforced
    // with the same loud guard). One nesting level only — arrays of
    // arrays/structs have no portable one-line replay and throw like
    // any unsupported type.
    case ArrayType(et, _) =>
      val enc = elementEncode(et, _)
      aggregate(transform(c, e => enc(e)), lit(1L),
        (acc, v) => pmod(acc * lit(31L) + coalesce(v, lit(M)), lit(M)))
    case other =>
      throw new IllegalArgumentException(
        s"no portable encoding for ${other.simpleString}")
  }

  private def elementEncode(dt: DataType, c: Column): Column = dt match {
    case DoubleType | FloatType =>
      // round half-toward-+inf at 6dp via floor(v*1e6 + 0.5): PURE IEEE
      // double ops, bit-identical across engines. A decimal cast is NOT
      // portable here: Spark converts float->decimal through the
      // shortest decimal string while DuckDB rounds the value, and a
      // float whose shortest form ends exactly in ...5 at 6dp (observed
      // in the embeddings fixture: -0.1880215) rounds differently.
      val d = c.cast(DoubleType)
      val guarded = when(c.isNull, lit(null).cast(DoubleType))
        .when(abs(d) < lit(1e12d), d)
        .otherwise(raise_error(concat(
          lit("columnChecksums: array element outside the 6dp " +
            "canonicalization range (|v| < 1e12, finite): "),
          c.cast(StringType))))
      pmod(floor(guarded * lit(1e6d) + lit(0.5d)).cast(LongType), lit(M))
    case _: ArrayType =>
      throw new IllegalArgumentException(
        "no portable encoding for nested arrays")
    case other => encode(other, c)
  }

  /** Per-column multiset fingerprint: (col_name, n_nonnull, checksum)
    * where checksum = SUM of the portable per-value encoding —
    * order-independent, so two tables with the same multiset of values
    * per column agree regardless of layout or partitioning. ONE
    * aggregation pass, scalar output; compare two tables' outputs
    * driver-side and reach for [[diffSummary]] only on mismatch.
    */
  def columnChecksums(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum at least one column")
    val (head, tail) = checksumAggs(df, cols)
    unpivotChecksums(df.agg(head, tail: _*), cols, Nil)
  }

  /** Per-group [[columnChecksums]] — the LOCALIZING middle tier of the
    * reconciliation workflow: whole-table fingerprints disagree → group
    * by the table's partition key (day, month, source) to find WHICH
    * partitions diverge → keyed-diff only those. Same one-pass
    * aggregation with the group key in front (shuffle ≤ groups ×
    * columns partial rows); output one row per (group, column).
    */
  def groupedColumnChecksums(df: DataFrame, groupCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum at least one column")
    require(!cols.contains(groupCol), "groupCol cannot also be summed")
    val (head, tail) = checksumAggs(df, cols)
    unpivotChecksums(df.groupBy(groupCol).agg(head, tail: _*), cols,
      Seq(groupCol))
  }

  // shared with the streaming form (graft.streaming.Streams
  // .streamingColumnChecksums): same encodings, same tidy unpivot
  private[graft] def checksumAggs(df: DataFrame,
      cols: Seq[String]): (Column, Seq[Column]) = {
    val aggs = cols.flatMap { name =>
      val c = col(name)
      Seq(count(c).as(s"__${name}__n"),
        sum(encode(df.schema(name).dataType, c)).as(s"__${name}__ck"))
    }
    (aggs.head, aggs.tail)
  }

  private[graft] def unpivotChecksums(wide: DataFrame, cols: Seq[String],
      keep: Seq[String]): DataFrame =
    wide.select(keep.map(col) :+ explode(array(cols.map { name =>
        struct(lit(name).as("col_name"),
          col(s"__${name}__n").as("n_nonnull"),
          coalesce(col(s"__${name}__ck"), lit(0L)).as("checksum"))
      }: _*)).as("m"): _*)
      // Column-API projection (not selectExpr): a keyword or spaced
      // group-column name must not hit the SQL parser
      .select(keep.map(col) ++ Seq("col_name", "n_nonnull", "checksum")
        .map(f => col(s"m.$f")): _*)
}
