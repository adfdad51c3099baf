package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a naive point-in-interval inequality
  * join — the `p.x BETWEEN i.lo AND i.hi` shape Spark can only plan as a
  * BroadcastNestedLoopJoin (or cartesian) — into the bucketized equi-join
  * of [[graft.operators.RangeJoin.pointInInterval]], directly on the
  * logical plan. Users keep writing the naive SQL; the engine plans the
  * scalable form. This is the bin-size range-join optimization production
  * engines expose as a hint, here as a session conf:
  *
  *  - `spark.graft.rangeJoin.binSize` (required to activate): the bucket
  *    width as a long > 0, in the join column's PHYSICAL units — the
  *    column's own units for int/long, DAYS for DATE, MICROSECONDS for
  *    TIMESTAMP — or the string `auto`, which derives the width from the
  *    interval side itself (p75 interval length via one bounded
  *    approxQuantile job, the [[graft.operators.RangeJoin
  *    .bucketWidthFor]] policy), caches it per (plan, bounds) shape, and
  *    records it per query to [[RangeJoinRewrite.derivedWidths]] /
  *    [[RangeJoinRewrite.lastDerivedWidth]] plus a log line (see
  *    `deriveWidth`);
  *  - `spark.graft.rangeJoin.maxSpanBuckets` (int, default 256): spans
  *    beyond this route to the salted long-tail rendezvous (same exact
  *    guard as the operator — see RangeJoin's scaladoc);
  *  - `spark.graft.rangeJoin.smallSideBytes` (long, default 8192; <= 0
  *    disables): the stats-aware small-side guard. When the INTERVAL
  *    side's optimizer size estimate (`plan.stats.sizeInBytes`, the
  *    same estimate broadcast planning reads) is at or below this, the
  *    rule DECLINES: a broadcast-tiny interval side makes Spark's own
  *    BroadcastNestedLoopJoin a per-row scan over a handful of cached
  *    rows — measured FASTER than paying this rewrite's two explodes
  *    and a shuffle (the 80-row monthly-window counter-case in
  *    COVERAGE.md). The guard is what makes session-wide enablement
  *    (`binSize=auto` for every query) safe: big shapes rewrite, tiny
  *    dims keep the plan Catalyst already chose. For the overlap shape
  *    BOTH sides replicate, so the guard declines when EITHER side is
  *    tiny. Size estimates, not row counts: without CBO row counts are
  *    usually absent, while sizeInBytes is always derivable from files.
  *
  * Applicability: INNER joins — plus LEFT/RIGHT OUTER joins whose
  * PRESERVED side is the points side, FULL OUTER joins (rewritten as
  * the inner form UNION the value-complemented unmatched rows of each
  * preserved side, null-extended; see `outerExtend`/`complement`), and
  * LEFT SEMI / LEFT ANTI joins (the `EXISTS` / `NOT EXISTS` interval
  * forms — "rows WITH / WITHOUT a covering interval", and the overlap
  * variant "intervals WITH / WITHOUT an overlapping interval" —
  * rewritten as the inner form's distinct preserved-tuples
  * semi/anti-joined back by value; see `matchedKey`). Both condition
  * SHAPES (point-in-interval and interval-overlap) compose with every
  * supported join type — the full shape × {inner, left, right, full,
  * semi, anti} matrix rewrites —
  * whose condition contains a lower and an
  * upper bound on the SAME expression `x` of one side, with both bounds
  * from the other side, over int/long/DATE/TIMESTAMP/DECIMAL axes (DATE
  * buckets on epoch days, TIMESTAMP on epoch micros, DECIMAL(p<=18, s)
  * on its unscaled long — cents for a scale-2 price, the dominant
  * non-time range axis; `binSize` for a decimal axis is likewise in
  * unscaled units. The reference's only range predicate is a date
  * window, so the time types are the ones its queries hit), and NO
  * equi-conjunct (`l = r`) — when an equality key
  * exists Catalyst already hash-joins on it and this rewrite would only
  * re-partition work it has placed. Bound SHAPES are sanity-checked:
  * each of `x`, `lo`, `hi` must be a deterministic expression over
  * exactly ONE attribute built from add/subtract/multiply/cast/negate and literals
  * (`ts - INTERVAL`, `cast(x as long) * 1000`). Anything more derived —
  * hashes, conditionals, multi-column arithmetic — no longer looks like
  * an interval bound; it is a generic theta join whose long hulls would
  * replicate to every salt and could run SLOWER than the nested loop it
  * replaces, so the rule leaves it alone. Strict
  * bounds are accepted: the rewrite tiles the closed hull `[lo, hi]`,
  * which is a superset, and re-applies the ORIGINAL predicates inside the
  * matched bucket, so `<`/`<=` mixes stay exact. A point probes its own
  * bucket of each kind exactly once and an interval indexes each key
  * exactly once, so no pair is emitted twice and no dedup is added —
  * the multiset result equals the nested-loop join's.
  *
  * The rewrite is purely logical: Generate(Explode) of the composite
  * (kind, bucket) keys on each side, a Join whose condition is the key
  * equality AND the original predicates, and a Project back to the
  * original Join's output attributes — parents above see identical
  * attribute ids and types.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val BinSizeKey = "spark.graft.rangeJoin.binSize"
  private val MaxSpanKey = "spark.graft.rangeJoin.maxSpanBuckets"
  private val SmallSideKey = "spark.graft.rangeJoin.smallSideBytes"

  private def keyType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("b", LongType, nullable = true)))

  // physical-unit long view of an axis expression: DATE -> epoch days,
  // TIMESTAMP -> epoch micros, int widened. Used only for bucketing and
  // salting; the ORIGINAL typed predicates refilter, so the mapping just
  // has to be monotone and engine-deterministic — which these are.
  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case DateType => Cast(UnixDate(e), LongType)
    case TimestampType => UnixMicros(e)
    // unscaled long view (a scale-2 price in cents): exact and monotone
    // for precision <= 18, which axisKind guarantees before we get here;
    // unit coherence across bound pairs is axisKind's per-scale kinds
    case _: DecimalType => UnscaledValue(e)
    case _ => Cast(e, LongType)
  }

  // ((c - pmod(c, w)) / w) cast long — the exact floor-bucket arithmetic
  // RangeJoin uses (double division is exact: the numerator is an exact
  // multiple of w and bucket counts sit far below 2^53)
  private def bucketOf(c: Expression, w: Long): Expression = {
    val c64 = asLong(c)
    val sub = Subtract(c64, Pmod(c64, Literal(w)))
    Cast(Divide(Cast(sub, DoubleType), Literal(w.toDouble)), LongType)
  }

  private def key(kind: Int, b: Expression): Expression =
    CreateNamedStruct(Seq(Literal("k"), Literal(kind), Literal("b"), b))

  // bucketizable axis families; a bound pair must agree (the analyzer's
  // type coercion already guarantees it for resolved comparisons, but the
  // matcher must not pair e.g. a day axis with a micros axis)
  private def axisKind(e: Expression): Int = e.dataType match {
    case IntegerType | LongType => 0
    case DateType => 1
    case TimestampType => 2
    // one kind PER SCALE: unscaled-long units only cohere between bounds
    // of equal scale (the comparison coercion makes each conjunct's two
    // sides agree; the per-scale kind extends that across conjuncts).
    // precision > 18 (Decimal128-backed) has no exact long view -> -1.
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      3 + d.scale
    case _ => -1
  }

  /** Shape sanity check: an interval BOUND is a deterministic expression
    * over exactly one attribute, built from arithmetic with literals and
    * casts. Derived hulls (hashes, CASE WHEN, multi-column arithmetic)
    * are generic theta-join conjuncts, not interval bounds — rewriting
    * them is a perf foot-gun (long hulls replicate to every salt), so
    * the matcher rejects them.
    */
  private def simpleAxis(e: Expression): Boolean = {
    def ok(x: Expression): Boolean = x match {
      case _: Attribute => true
      case _: Literal => true
      case c: Cast => ok(c.child)
      // decimal arithmetic results arrive wrapped for precision checking
      case co: CheckOverflow => ok(co.child)
      case a: Add => ok(a.left) && ok(a.right)
      case s: Subtract => ok(s.left) && ok(s.right)
      case m: Multiply => ok(m.left) && ok(m.right)
      case u: UnaryMinus => ok(u.child)
      // date/time arithmetic with literal intervals — the `ts + INTERVAL
      // '6' HOUR` / `date_add(d, 7)` bounds naive SQL writes (by the
      // user-provided optimizer batch, RuntimeReplaceable `-` wrappers
      // are already replaced with these)
      case d @ (_: DateAdd | _: DateSub | _: DateAddInterval |
          _: TimestampAddInterval | _: UnixDate | _: UnixMicros) =>
        d.children.forall(ok)
      case _ => false
    }
    e.deterministic && e.references.size == 1 && ok(e)
  }

  private def axisPair(x: Expression, b: Expression): Boolean = {
    val k = axisKind(x)
    k >= 0 && axisKind(b) == k && simpleAxis(x) && simpleAxis(b)
  }

  /** One bound of the range condition: `x` rel `bound`. */
  private case class Bound(x: Expression, bound: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = spark.conf.get(BinSizeKey, "0").trim
    // None = auto (derive per matched join); Some(w) = explicit width
    val width: Option[Long] =
      if (raw.equalsIgnoreCase("auto")) None
      else {
        val w = try raw.toLong catch { case _: NumberFormatException => 0L }
        if (w <= 0) return plan
        // explicit width: clear this thread's auto-derivation echo so an
        // observer never attributes a PREVIOUS query's derived width to
        // this one (the same invariant the retired conf echo kept by
        // unsetting). Auto mode deliberately does NOT clear here — the
        // user-provided optimizer batch runs to fixed point, and a
        // second pass over the already-rewritten plan must not erase
        // the width the first pass just recorded.
        RangeJoinRewrite.clearThreadDerived()
        Some(w)
      }
    val cap =
      try spark.conf.get(MaxSpanKey, "256").toInt
      catch { case _: NumberFormatException => 256 }
    val smallSide =
      try spark.conf.get(SmallSideKey, "8192").toLong
      catch { case _: NumberFormatException => 8192L }
    plan transformUp {
      case j @ Join(_, _,
          Inner | LeftOuter | RightOuter | FullOuter | LeftSemi | LeftAnti,
          Some(_), _) =>
        rewrite(j, width, math.max(cap, 1), smallSide).getOrElse(j)
    }
  }

  // auto-mode width memo, keyed by the canonicalized (interval plan,
  // bounds) shape so fixed-point optimizer passes and repeated queries
  // over the same frame pay the one bounded stats job once. Stats-derived
  // perf knob only — a stale entry after the underlying files change
  // cannot affect correctness, just bucket fill.
  @transient private lazy val widthMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (LogicalPlan, Expression, Expression), java.lang.Long]()

  /** Derive the bucket width from the interval side: p75 of the positive
    * span lengths in PHYSICAL units (days/micros/raw), the
    * [[graft.operators.RangeJoin.bucketWidthFor]] policy, via one bounded
    * approxQuantile job (Greenwald–Khanna sketch, a few KB to the
    * driver). Runs DURING optimization of the outer query — safe because
    * the derivation plan is a plain projection of one join side (its own
    * optimization cannot re-enter this join), and failure of any kind
    * just declines the rewrite.
    *
    * Observability is PER QUERY, not session conf (the former
    * `derivedBinSize` conf echo raced under concurrent queries —
    * retired round 15): every derivation (memo hit or miss) records to
    * [[RangeJoinRewrite.derivedWidths]] keyed by the interval shape's
    * semantic hash, sets the calling THREAD's
    * [[RangeJoinRewrite.lastDerivedWidth]] (a query optimizes on the
    * thread that triggers its planning, so concurrent sessions/threads
    * cannot clobber each other's view), and emits one log line carrying
    * the shape hash and the width.
    *
    * Remaining auto-mode caveat, by design: the derivation EXECUTES the
    * interval subplan once more than the query does (the quantile job),
    * so an expensive UNCACHED interval frame pays one extra pass. The
    * memo de-dupes repeats of the same shape, and a PERSISTED interval
    * side is free (the cache manager substitutes the InMemoryRelation
    * into the derivation's projection too, since it matches by
    * canonicalized subplan); for a derived interval side, persist it or
    * set an explicit width.
    */
  private def deriveWidth(ivs: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] =
    try {
      val memoKey = (ivs.canonicalized, lo.canonicalized, hi.canonicalized)
      // value type is java.lang.Long so an absent key stays an observable
      // null (a scala.Long value type would silently unbox null to 0)
      val hit = widthMemo.get(memoKey)
      val w: Long = if (hit != null) hit.longValue else {
        if (widthMemo.size > 100) widthMemo.clear()
        // delegate to the operator's policy (single source of truth for
        // the quantile, epsilon, and degenerate-case handling): project
        // the physical-unit bounds and hand the frame over
        val df = org.apache.spark.sql.graftshim.ColumnBridge.ofRows(spark,
          Project(Seq(Alias(asLong(lo), "__s")(), Alias(asLong(hi), "__e")()),
            ivs))
        val derived = graft.operators.RangeJoin.bucketWidthFor(df, "__s", "__e")
        widthMemo.put(memoKey, derived)
        derived
      }
      // per-query attribution: shape-keyed registry + this thread's view
      // + one log line — recorded on memo HITS too, so a repeated query
      // still attributes its width. The key concatenates all three
      // semantic hashes (96 bits of discrimination) rather than folding
      // them into one Int, so two distinct shapes cannot silently
      // overwrite each other's registry entry.
      val shapeKey = s"${memoKey._1.semanticHash()}:" +
        s"${memoKey._2.semanticHash()}:${memoKey._3.semanticHash()}"
      RangeJoinRewrite.recordDerived(shapeKey, w)
      logInfo(s"rangeJoin binSize=auto: width=$w " +
        s"intervalShape=$shapeKey")
      Some(w)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, confWidth: Option[Long],
      cap: Int, smallSide: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjuncts(cond)
    // bail out when an equi-conjunct exists — Catalyst hash-joins on it
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    def fromSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)

    // collect bounds with x on `pointSide`, bound on `ivSide`
    def bounds(pointSide: LogicalPlan, ivSide: LogicalPlan,
        lower: Boolean): Seq[Bound] = conjuncts.collect {
      // lower: x >= lo | x > lo | lo <= x | lo < x
      case GreaterThanOrEqual(x, lo) if lower &&
        fromSide(x, pointSide) && fromSide(lo, ivSide) &&
        axisPair(x, lo) => Bound(x, lo)
      case GreaterThan(x, lo) if lower &&
        fromSide(x, pointSide) && fromSide(lo, ivSide) &&
        axisPair(x, lo) => Bound(x, lo)
      case LessThanOrEqual(lo, x) if lower &&
        fromSide(x, pointSide) && fromSide(lo, ivSide) &&
        axisPair(x, lo) => Bound(x, lo)
      case LessThan(lo, x) if lower &&
        fromSide(x, pointSide) && fromSide(lo, ivSide) &&
        axisPair(x, lo) => Bound(x, lo)
      // upper: x <= hi | x < hi | hi >= x | hi > x
      case LessThanOrEqual(x, hi) if !lower &&
        fromSide(x, pointSide) && fromSide(hi, ivSide) &&
        axisPair(x, hi) => Bound(x, hi)
      case LessThan(x, hi) if !lower &&
        fromSide(x, pointSide) && fromSide(hi, ivSide) &&
        axisPair(x, hi) => Bound(x, hi)
      case GreaterThanOrEqual(hi, x) if !lower &&
        fromSide(x, pointSide) && fromSide(hi, ivSide) &&
        axisPair(x, hi) => Bound(x, hi)
      case GreaterThan(hi, x) if !lower &&
        fromSide(x, pointSide) && fromSide(hi, ivSide) &&
        axisPair(x, hi) => Bound(x, hi)
    }

    // try both orientations: points on the left, then points on the right
    def orient(pointSide: LogicalPlan, ivSide: LogicalPlan):
        Option[(Expression, Expression, Expression)] = {
      val lowers = bounds(pointSide, ivSide, lower = true)
      val uppers = bounds(pointSide, ivSide, lower = false)
      val matched = for {
        lo <- lowers
        hi <- uppers
        if lo.x.semanticEquals(hi.x)
      } yield (lo.x, lo.bound, hi.bound)
      matched.headOption
    }

    val salts = math.max(
      spark.sessionState.conf.numShufflePartitions, 16).toLong

    def build(pointsLeft: Boolean, x: Expression, lo: Expression,
        hi: Expression, width: Long): LogicalPlan = {
      val (points, rawIvs) = if (pointsLeft) (left, right) else (right, left)
      // an INVERTED interval row (hi < lo) can never satisfy both
      // original bounds, so it is FILTERED, not salt-routed: down the
      // salt arm it would pair with every point's probe before the
      // refilter rejected it (|points| x |inverted| wasted rows), and it
      // must never reach Sequence (descending range). NULL bounds drop
      // with it — they can't satisfy the original predicates either.
      // (The interval-overlap shape below does NOT share this filter:
      // its two independent inequalities CAN hold for inverted rows.)
      val ivs = Filter(GreaterThanOrEqual(asLong(hi), asLong(lo)), rawIvs)
      // points: own bucket (kind 0) + one salt probe (kind 1)
      val pKeys = CreateArray(Seq(
        key(0, bucketOf(x, width)),
        key(1, Pmod(XxHash64(Seq(asLong(x)), 42L), Literal(salts)))))
      // intervals: closed-hull tiling when short, all salts when long
      val sb = bucketOf(lo, width)
      val eb = bucketOf(hi, width)
      val lv = NamedLambdaVariable("b", LongType, nullable = true)
      // Sequence is TimeZoneAwareExpression: without a zone id it is
      // UNRESOLVED and the optimizer's plan validation rejects the batch
      // (the zone is irrelevant for integral sequences)
      val tile = ArrayTransform(
        new Sequence(sb, eb, None, Some("UTC")),
        LambdaFunction(key(0, lv), Seq(lv)))
      val sv = NamedLambdaVariable("s", LongType, nullable = true)
      val saltKeys = ArrayTransform(
        new Sequence(Literal(0L), Literal(salts - 1L), None, Some("UTC")),
        LambdaFunction(key(1, sv), Seq(sv)))
      // spans are non-negative after the inverted-row filter above
      val ivKeys = If(
        LessThan(Subtract(eb, sb), Literal(cap.toLong)),
        tile, saltKeys)

      def gen(child: LogicalPlan, keys: Expression):
          (LogicalPlan, Attribute, Attribute) = {
        val gOut = AttributeReference("__gkey", keyType, nullable = true)()
        val g = Generate(Explode(keys), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(gOut), child = child)
        val kA = Alias(GetStructField(gOut, 0, Some("k")), "__gk")()
        val bA = Alias(GetStructField(gOut, 1, Some("b")), "__gb")()
        (Project(child.output ++ Seq(kA, bA), g),
          kA.toAttribute, bA.toAttribute)
      }
      val (pGen, pk, pb) = gen(points, pKeys)
      val (iGen, ik, ib) = gen(ivs, ivKeys)
      val (lGen, rGen) = if (pointsLeft) (pGen, iGen) else (iGen, pGen)
      // key equality AND every original conjunct — the exact predicates
      // re-filter inside the matched bucket, so strict bounds and any
      // extra (non-equi) conditions keep their semantics
      val newCond = (Seq(EqualTo(pk, ik), EqualTo(pb, ib)) ++ conjuncts)
        .reduce(And)
      Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
    }

    // interval x interval OVERLAP shape: two cross-side inequalities on
    // DIFFERENT left expressions — `lStart (<|<=) rEnd AND rStart (<|<=)
    // lEnd`. (When both left expressions coincide it is the point shape,
    // which the orientations above already claimed.)
    def orientOverlap():
        Option[(Expression, Expression, Expression, Expression)] = {
      // cross-side "less" pairs in both directions
      def less(aSide: LogicalPlan, bSide: LogicalPlan): Seq[Bound] =
        conjuncts.collect {
          case LessThan(a, b) if fromSide(a, aSide) && fromSide(b, bSide) &&
            axisPair(a, b) => Bound(a, b)
          case LessThanOrEqual(a, b)
            if fromSide(a, aSide) && fromSide(b, bSide) &&
              axisPair(a, b) => Bound(a, b)
          case GreaterThan(b, a) if fromSide(a, aSide) && fromSide(b, bSide) &&
            axisPair(a, b) => Bound(a, b)
          case GreaterThanOrEqual(b, a)
            if fromSide(a, aSide) && fromSide(b, bSide) &&
              axisPair(a, b) => Bound(a, b)
        }
      val lr = less(left, right) // (lStart, rEnd) candidates
      val rl = less(right, left) // (rStart, lEnd) candidates
      val matched = for {
        Bound(ls, re) <- lr
        Bound(rs, le) <- rl
        if !ls.semanticEquals(le) // same left expr => point shape, skip
        if !rs.semanticEquals(re)
      } yield (ls, le, rs, re)
      matched.headOption
    }

    def buildOverlap(ls: Expression, le: Expression, rs: Expression,
        re: Expression, width: Long): LogicalPlan = {
      def saltOf(s: Expression, e: Expression) =
        Pmod(XxHash64(Seq(asLong(s), asLong(e)), 42L), Literal(salts))
      def allSalts(kind: Int) = {
        val sv = NamedLambdaVariable("s", LongType, nullable = true)
        ArrayTransform(
          new Sequence(Literal(0L), Literal(salts - 1L), None, Some("UTC")),
          LambdaFunction(key(kind, sv), Seq(sv)))
      }
      // closed-hull tiling bucket(start)..bucket(end): superset for both
      // strict and non-strict predicates; the originals refilter exactly
      def keys(s: Expression, e: Expression, idxKind: Int,
          probeKind: Int): Expression = {
        val sb = bucketOf(s, width)
        val eb = bucketOf(e, width)
        val lv = NamedLambdaVariable("b", LongType, nullable = true)
        val tile = ArrayTransform(
          new Sequence(sb, eb, None, Some("UTC")),
          LambdaFunction(key(0, lv), Seq(lv)))
        val shortKeys = Concat(Seq(tile,
          CreateArray(Seq(key(probeKind, saltOf(s, e))))))
        // left long indexes kind 1 only (its pairs ride right's kind-1
        // probes); right long indexes kind 2 AND probes kind 1 so
        // long x long lands exactly once — and inverted bounds route
        // down this salt arm too, where the ORIGINAL predicates refilter
        // them exactly. Do NOT "optimize" inverted rows away: in the
        // overlap shape an inverted interval CAN legitimately satisfy
        // the two-sided inequality (RangeJoinRewriteSpec plants row
        // (40,10) whose match must survive) — unlike the point shape,
        // where containment in an empty interval is impossible
        val longKeys =
          if (idxKind == 1) allSalts(1)
          else Concat(Seq(allSalts(2),
            CreateArray(Seq(key(1, saltOf(s, e))))))
        If(And(GreaterThanOrEqual(eb, sb),
          LessThan(Subtract(eb, sb), Literal(cap.toLong))),
          shortKeys, longKeys)
      }
      def gen(child: LogicalPlan, ks: Expression):
          (LogicalPlan, Attribute, Attribute) = {
        val gOut = AttributeReference("__gkey", keyType, nullable = true)()
        val g = Generate(Explode(ks), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(gOut), child = child)
        val kA = Alias(GetStructField(gOut, 0, Some("k")), "__gk")()
        val bA = Alias(GetStructField(gOut, 1, Some("b")), "__gb")()
        (Project(child.output ++ Seq(kA, bA), g),
          kA.toAttribute, bA.toAttribute)
      }
      val (lGen, lk, lb) = gen(left, keys(ls, le, idxKind = 1,
        probeKind = 2))
      val (rGen, rk, rb) = gen(right, keys(rs, re, idxKind = 2,
        probeKind = 1))
      // tiled pairs co-occur in every bucket their overlap spans: emit
      // only in the bucket containing the overlap start (kinds 1/2 meet
      // in exactly one salt by construction)
      val emitOnce = Or(Not(EqualTo(lk, Literal(0))),
        EqualTo(lb,
          bucketOf(Greatest(Seq(asLong(ls), asLong(rs))), width)))
      val newCond = (Seq(EqualTo(lk, rk), EqualTo(lb, rb)) ++ conjuncts ++
        Seq(emitOnce)).reduce(And)
      Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
    }

    // stats-aware small-side guard: a broadcast-tiny replicating side
    // means Spark's own BNLJ beats this rewrite's explodes + shuffle —
    // decline and keep the plan Catalyst chose. Reads the same estimate
    // broadcast planning does; an unobtainable estimate counts as big
    // (the rewrite is exact either way, so erring big only trades plans).
    // Checked BEFORE width derivation so declined joins never pay the
    // auto-mode stats job.
    def bigEnough(side: LogicalPlan): Boolean =
      smallSide <= 0L || {
        try side.stats.sizeInBytes > BigInt(smallSide)
        catch { case scala.util.control.NonFatal(_) => true }
      }

    // auto mode resolves the width from the interval side of whichever
    // orientation matched; a failed derivation declines the rewrite
    def widthOr(ivs: LogicalPlan, lo: Expression, hi: Expression) =
      confWidth.orElse(deriveWidth(ivs, lo, hi))

    /** Outer-extend a rewritten INNER `matched` plan back to the outer
      * join's semantics, WITHOUT row ids: the preserved side's unmatched
      * rows are `preserved` LEFT ANTI joined — null-safe, by VALUE over
      * its full output tuple — against the DISTINCT preserved-tuples of
      * `matched`, then null-extended on the other side's columns and
      * unioned in. Identical preserved rows have identical match sets,
      * so value-based complementation IS multiset outer semantics, and
      * every branch is deterministic (re-executing `matched` inside the
      * anti arm reuses its exchanges at the physical layer). The union's
      * first child is `matched`, which already projects `j.output`, so
      * parents keep their attribute ids.
      */
    /** The DISTINCT preserved-side tuples of `matched` (fresh output ids)
      * plus the null-safe value-equality condition tying them back to
      * `preserved`'s own attributes — the shared core of the outer
      * complement and the semi/anti rewrites.
      */
    def matchedKey(matched: LogicalPlan,
        preserved: LogicalPlan): (LogicalPlan, Expression) = {
      val pAttrs = preserved.output
      val grouped = Aggregate(pAttrs,
        pAttrs.map(a => Alias(a, a.name)()),
        Project(pAttrs, matched))
      val gAttrs = grouped.aggregateExpressions.map(_.toAttribute)
      val cond = pAttrs.zip(gAttrs)
        .map { case (l, r) => EqualNullSafe(l, r) }
        .reduceLeft[Expression](And)
      (grouped, cond)
    }

    def complement(matched: LogicalPlan,
        preserved: LogicalPlan): LogicalPlan = {
      val (grouped, antiCond) = matchedKey(matched, preserved)
      val anti = Join(preserved, grouped, LeftAnti, Some(antiCond),
        JoinHint.NONE)
      Project(j.output.map { a =>
        if (preserved.outputSet.contains(a)) a
        else Alias(Literal(null, a.dataType), a.name)()
      }, anti)
    }

    def outerExtend(matched: LogicalPlan,
        preserved: LogicalPlan): LogicalPlan =
      Union(Seq(matched, complement(matched, preserved)))

    // the value-based complement groups by the preserved side's full
    // tuple — un-groupable column types (maps, variants) decline the
    // outer rewrite instead of failing at physical planning
    def groupable(dt: DataType): Boolean = dt match {
      case _: MapType | _: VariantType => false
      case st: StructType => st.fields.forall(f => groupable(f.dataType))
      case at: ArrayType => groupable(at.elementType)
      case _ => true
    }
    def outerOk(preserved: LogicalPlan): Boolean =
      preserved.output.nonEmpty &&
        preserved.output.forall(a => groupable(a.dataType))

    // outer joins rewrite only in the orientation whose PRESERVED side
    // is the points side (every preserved row must survive exactly once;
    // the interval side may replicate freely). Inner joins try both
    // orientations plus the interval-overlap shape.
    // the overlap-shape arm shared by every join type: both sides
    // replicate, so BOTH must pass the small-side guard; `finish` wraps
    // the bucketized overlap core per the join type's semantics
    def overlapArm(finish: LogicalPlan => LogicalPlan)
        : Option[LogicalPlan] =
      orientOverlap()
        .filter(_ => bigEnough(left) && bigEnough(right))
        .flatMap { case (ls, le, rs, re) =>
          widthOr(left, ls, le).map(w =>
            finish(buildOverlap(ls, le, rs, re, w)))
        }

    j.joinType match {
      case LeftOuter =>
        if (!outerOk(left)) return None
        orient(left, right).filter(_ => bigEnough(right))
          .flatMap { case (x, lo, hi) =>
            widthOr(right, lo, hi).map(w =>
              outerExtend(build(pointsLeft = true, x, lo, hi, w), left))
        }.orElse(
          // overlap LEFT OUTER: unmatched left intervals — including
          // inverted/empty ones, which can never match — null-extend,
          // exactly as the naive outer join leaves them
          overlapArm(m => outerExtend(m, left)))
      case RightOuter =>
        if (!outerOk(right)) return None
        orient(right, left).filter(_ => bigEnough(left))
          .flatMap { case (x, lo, hi) =>
            widthOr(left, lo, hi).map(w =>
              outerExtend(build(pointsLeft = false, x, lo, hi, w), right))
        }.orElse(overlapArm(m => outerExtend(m, right)))
      // FULL OUTER: the inner rewrite UNION the value-based complement of
      // BOTH sides (each anti-joined against the matched set and
      // null-extended on the other side's columns). Both sides are
      // preserved, so both must be groupable; either orientation works
      // for the matched core — take whichever matches, requiring the
      // replicating interval side of that orientation to pass the
      // small-side guard.
      // LEFT SEMI / LEFT ANTI (EXISTS / NOT EXISTS interval forms): the
      // preserved side is always the LEFT; the points expression may sit
      // on either side. Rewrite = the inner form's DISTINCT left-tuples,
      // semi/anti-joined back to `left` by null-safe value equality.
      // Identical left rows have identical match status, so value-based
      // membership IS multiset semi/anti semantics — and a NULL-axis left
      // row never appears in `matched` (the original predicates reject
      // it), so NOT EXISTS keeps it, exactly as the nested loop would.
      case LeftSemi | LeftAnti =>
        if (!outerOk(left)) return None
        def semiAnti(matched: LogicalPlan): LogicalPlan = {
          val (grouped, cond) = matchedKey(matched, left)
          Join(left, grouped, j.joinType, Some(cond), JoinHint.NONE)
        }
        orient(left, right).filter(_ => bigEnough(right))
          .flatMap { case (x, lo, hi) =>
            widthOr(right, lo, hi).map(w =>
              semiAnti(build(pointsLeft = true, x, lo, hi, w)))
        }.orElse(orient(right, left).filter(_ => bigEnough(left))
          .flatMap { case (x, lo, hi) =>
            widthOr(left, lo, hi).map(w =>
              semiAnti(build(pointsLeft = false, x, lo, hi, w)))
        })
          // "rows WITH/WITHOUT an overlapping interval": the overlap
          // core projects j.output (= left.output here), so the same
          // distinct-tuples membership construction applies verbatim
          .orElse(overlapArm(semiAnti))
      case FullOuter =>
        if (!outerOk(left) || !outerOk(right)) return None
        def full(matched: LogicalPlan): LogicalPlan =
          Union(Seq(matched, complement(matched, left),
            complement(matched, right)))
        orient(left, right).filter(_ => bigEnough(right))
          .flatMap { case (x, lo, hi) =>
            widthOr(right, lo, hi).map(w =>
              full(build(pointsLeft = true, x, lo, hi, w)))
        }.orElse(orient(right, left).filter(_ => bigEnough(left))
          .flatMap { case (x, lo, hi) =>
            widthOr(left, lo, hi).map(w =>
              full(build(pointsLeft = false, x, lo, hi, w)))
        }).orElse(overlapArm(full))
      case _ =>
        orient(left, right).filter(_ => bigEnough(right))
          .flatMap { case (x, lo, hi) =>
            widthOr(right, lo, hi).map(w =>
              build(pointsLeft = true, x, lo, hi, w))
        }.orElse(orient(right, left).filter(_ => bigEnough(left))
          .flatMap { case (x, lo, hi) =>
            widthOr(left, lo, hi).map(w =>
              build(pointsLeft = false, x, lo, hi, w))
        }).orElse(overlapArm(identity))
    }
  }
}

/** Per-query observability for binSize=auto derivations. The former
  * session-conf echo (`spark.graft.rangeJoin.derivedBinSize`) was
  * last-write-wins under concurrent queries; these signals are not:
  *
  *  - [[derivedWidths]]: bounded registry keyed by the interval shape's
  *    semantic hash (the same (plan, lo, hi) canonical triple the width
  *    memo keys on), so distinct concurrent queries land on distinct
  *    keys;
  *  - [[lastDerivedWidth]]: THREAD-local — a query plans on the thread
  *    that triggers its execution, so each caller reads its own last
  *    derivation regardless of what other sessions/threads derive
  *    concurrently (with several auto-rewritten joins in ONE query this
  *    is the last of them; use the registry/log for the full set);
  *  - the `rangeJoin binSize=auto` log line carries both.
  *
  * Observability only — never read back by the rule; a stale entry can
  * mislead an observer, never a plan.
  */
object RangeJoinRewrite {
  private val widths =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val last = new ThreadLocal[Option[Long]] {
    override def initialValue: Option[Long] = None
  }

  private[plans] def recordDerived(shapeKey: String, w: Long): Unit = {
    // evict ONE arbitrary stale entry past the bound instead of wiping
    // the map: a clear() here would race away entries other threads
    // recorded a moment ago, exactly the concurrent-observer hole the
    // registry replaced the conf echo to close
    while (widths.size > 100) {
      val it = widths.keys()
      if (it.hasMoreElements) widths.remove(it.nextElement()) else
        widths.clear()
    }
    widths.put(shapeKey, w)
    last.set(Some(w))
  }

  private[plans] def clearThreadDerived(): Unit = last.set(None)

  /** Derived widths keyed by the interval shape's three semantic hashes
    * joined as "plan:lo:hi" (bounded, ~100 entries, single eviction).
    */
  def derivedWidths: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    widths.forEach((k, v) => b += (k -> v.longValue))
    b.result()
  }

  /** The calling thread's most recent auto-derived width, if any —
    * cleared when the same thread next plans with an EXPLICIT binSize,
    * so a fixed-width query is never mis-attributed an old derivation.
    */
  def lastDerivedWidth: Option[Long] = last.get()
}
