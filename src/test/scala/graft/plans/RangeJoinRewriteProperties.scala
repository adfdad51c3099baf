package graft.plans

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fuzz harness for the [[RangeJoinRewrite]] MATCHER: random join-
  * condition shapes over random axis types, bound styles, operand
  * flips, strictness mixes, conjunct orders, and join types.
  *
  * Shared by both property objects below: [[RangeJoinRewriteFuzzPlan]]
  * checks 1000+ shapes at the PLAN level (the rule fires exactly on the
  * eligible shapes and never crashes the optimizer), and
  * [[RangeJoinRewriteFuzzExec]] executes a subset end-to-end against an
  * in-Scala multiset oracle (rule-on result == naive semantics).
  */
private[plans] object RangeJoinFuzz {

  /** One random join-condition shape. `equiKey` and `thetaBound` make
    * the join ineligible (the rule must decline); everything else is a
    * style axis the matcher must be insensitive to.
    */
  case class Shape(axis: String, joinType: String,
      flipLower: Boolean, flipUpper: Boolean,
      strictLower: Boolean, strictUpper: Boolean,
      extraPred: Boolean, equiKey: Boolean, thetaBound: Boolean,
      shuffleSeed: Long)

  val genShape: Gen[Shape] = for {
    axis <- Gen.oneOf("long", "int", "date", "ts", "dec")
    jt <- Gen.oneOf("inner", "left", "full", "semi", "anti")
    fl <- Gen.oneOf(true, false)
    fu <- Gen.oneOf(true, false)
    sl <- Gen.oneOf(true, false)
    su <- Gen.oneOf(true, false)
    ep <- Gen.oneOf(true, false)
    eq <- Gen.frequency(3 -> false, 1 -> true)
    th <- Gen.frequency(3 -> false, 1 -> true)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield Shape(axis, jt, fl, fu, sl, su, ep, eq, th, seed)

  val genPoints: Gen[List[(Long, Long)]] =
    Gen.listOfN(12, Gen.choose(-100L, 100L))
      .map(_.zipWithIndex.map { case (x, i) => (i.toLong, x) })

  val genIvs: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-5L, 60L)))
      .map(_.zipWithIndex.map { case ((s, len), i) =>
        (i.toLong, s, s + len)
      })

  /** The axis mappings are monotone injections from the raw longs, so
    * the in-Scala oracle compares the raw longs directly.
    */
  def axisExpr(c: org.apache.spark.sql.Column, axis: String) = axis match {
    case "long" => c
    case "int" => c.cast("int")
    case "date" =>
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), c.cast("int"))
    case "ts" => timestamp_micros(c * lit(3600000000L))
    case "dec" => c.cast("decimal(12,2)")
  }

  def binSizeFor(axis: String): Long = axis match {
    case "ts" => 7L * 3600000000L // 7 "hours" of micros
    case "dec" => 700L // 7 units in unscaled (scale-2) cents
    case _ => 7L
  }

  /** Build the join under `shape` on `session` and the eligibility
    * verdict. Conjunct order is shuffled by the shape's seed.
    */
  def buildJoin(session: SparkSession, shape: Shape,
      ps: List[(Long, Long)], is: List[(Long, Long, Long)])
      : (DataFrame, Boolean) = {
    import session.implicits._
    val p = ps.toDF("pid", "xraw")
      .select(col("pid"), axisExpr(col("xraw"), shape.axis).as("ax"),
        pmod(col("pid"), lit(3L)).as("pk"))
    val iv = is.toDF("iid", "lraw", "hraw")
      .select(col("iid"), col("lraw"),
        axisExpr(col("lraw"), shape.axis).as("alo"),
        axisExpr(col("hraw"), shape.axis).as("ahi"),
        pmod(col("iid"), lit(3L)).as("ik"))
    val lower =
      (shape.flipLower, shape.strictLower) match {
        case (false, false) => col("ax") >= col("alo")
        case (false, true) => col("ax") > col("alo")
        case (true, false) => col("alo") <= col("ax")
        case (true, true) => col("alo") < col("ax")
      }
    val upper =
      (shape.flipUpper, shape.strictUpper) match {
        case (false, false) => col("ax") <= col("ahi")
        case (false, true) => col("ax") < col("ahi")
        case (true, false) => col("ahi") >= col("ax")
        case (true, true) => col("ahi") > col("ax")
      }
    // a theta lower bound references TWO interval attributes (same
    // value as the plain non-strict bound, since iid - iid == 0) — the
    // shape sanity check must refuse to treat it as an interval bound
    val effLower =
      if (shape.thetaBound)
        col("ax") >= axisExpr(
          col("lraw") + col("iid") - col("iid"), shape.axis)
      else lower
    val conjuncts =
      Seq(effLower, upper) ++
        (if (shape.extraPred) Seq(col("pid") =!= col("iid")) else Nil) ++
        (if (shape.equiKey) Seq(col("pk") === col("ik")) else Nil)
    val cond = new scala.util.Random(shape.shuffleSeed)
      .shuffle(conjuncts).reduce(_ && _)
    val jt = shape.joinType match {
      case "semi" => "left_semi"
      case "anti" => "left_anti"
      case j => j
    }
    val joined = p.join(iv, cond, jt)
    val eligible = !shape.equiKey && !shape.thetaBound
    // semi/anti output carries only the left side; normalize to the
    // shared (pid, iid) projection with iid always null
    val out =
      if (shape.joinType == "semi" || shape.joinType == "anti")
        joined.select(col("pid"), lit(null).cast("long").as("iid"))
      else joined.select("pid", "iid")
    (out, eligible)
  }

  /** In-Scala multiset oracle over the raw longs — models inner, left
    * outer (unmatched points null-extended), full outer (unmatched
    * points AND unmatched intervals null-extended), and semi/anti
    * (points with / without any match, once each).
    */
  def oracle(shape: Shape, ps: List[(Long, Long)],
      is: List[(Long, Long, Long)])
      : List[(Option[Long], Option[Long])] = {
    def pairs(pid: Long, x: Long) = is.filter { case (iid, lo, hi) =>
      val lowerOk =
        if (shape.thetaBound) x >= lo
        else if (shape.strictLower) x > lo else x >= lo
      val upperOk = if (shape.strictUpper) x < hi else x <= hi
      lowerOk && upperOk &&
        (!shape.extraPred || pid != iid) &&
        (!shape.equiKey || pid % 3 == iid % 3)
    }.map(_._1)
    // semi = points WITH a match, once each; anti = points WITHOUT one
    if (shape.joinType == "semi" || shape.joinType == "anti")
      return ps.collect {
        case (pid, x)
            if pairs(pid, x).nonEmpty == (shape.joinType == "semi") =>
          (Option(pid), Option.empty[Long])
      }.sortBy(r => (r._1, r._2))
    val fromPoints: List[(Option[Long], Option[Long])] =
      ps.flatMap { case (pid, x) =>
        val m = pairs(pid, x)
        if (m.nonEmpty) m.map(iid => (Option(pid), Option(iid)))
        else if (shape.joinType == "left" || shape.joinType == "full")
          List((Option(pid), Option.empty[Long]))
        else Nil
      }
    val matchedIvs = ps.flatMap { case (pid, x) => pairs(pid, x) }.toSet
    val fromIvs: List[(Option[Long], Option[Long])] =
      if (shape.joinType == "full")
        is.collect { case (iid, _, _) if !matchedIvs.contains(iid) =>
          (Option.empty[Long], Option(iid))
        }
      else Nil
    (fromPoints ++ fromIvs).sortBy(r => (r._1, r._2))
  }
}

/** Fuzz for the interval-OVERLAP shape across the full join-type matrix
  * (the round-14 completion): random strictness/flips/conjunct order/
  * axis types over random interval sets — inverted and long spans
  * included — checked at the plan level (fires exactly on eligible
  * shapes) and end-to-end against an in-Scala oracle. Note the overlap
  * shape's inverted-interval semantics: an inverted interval CAN satisfy
  * the two independent inequalities, so the oracle makes no
  * filtered-out assumption.
  */
private[plans] object RangeJoinOverlapFuzz {

  case class Shape(axis: String, joinType: String,
      flipA: Boolean, flipB: Boolean,
      strictA: Boolean, strictB: Boolean,
      extraPred: Boolean, equiKey: Boolean, thetaBound: Boolean,
      shuffleSeed: Long)

  val genShape: Gen[Shape] = for {
    axis <- Gen.oneOf("long", "int", "date", "ts", "dec")
    jt <- Gen.oneOf("inner", "left", "right", "full", "semi", "anti")
    fa <- Gen.oneOf(true, false)
    fb <- Gen.oneOf(true, false)
    sa <- Gen.oneOf(true, false)
    sb <- Gen.oneOf(true, false)
    ep <- Gen.oneOf(true, false)
    eq <- Gen.frequency(3 -> false, 1 -> true)
    th <- Gen.frequency(3 -> false, 1 -> true)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield Shape(axis, jt, fa, fb, sa, sb, ep, eq, th, seed)

  def buildJoin(session: SparkSession, shape: Shape,
      ls: List[(Long, Long, Long)], rs: List[(Long, Long, Long)])
      : (DataFrame, Boolean) = {
    import session.implicits._
    import RangeJoinFuzz.axisExpr
    val l = ls.toDF("lid", "lsraw", "leraw")
      .select(col("lid"), col("lsraw"),
        axisExpr(col("lsraw"), shape.axis).as("als"),
        axisExpr(col("leraw"), shape.axis).as("ale"),
        pmod(col("lid"), lit(3L)).as("lk"))
    val r = rs.toDF("rid", "rsraw", "reraw")
      .select(col("rid"), col("rsraw"), col("reraw"),
        axisExpr(col("rsraw"), shape.axis).as("ars"),
        axisExpr(col("reraw"), shape.axis).as("are"),
        pmod(col("rid"), lit(3L)).as("rk"))
    // overlap: lStart REL rEnd AND rStart REL lEnd
    val condA = (shape.flipA, shape.strictA) match {
      case (false, false) => col("als") <= col("are")
      case (false, true) => col("als") < col("are")
      case (true, false) => col("are") >= col("als")
      case (true, true) => col("are") > col("als")
    }
    val condB = (shape.flipB, shape.strictB) match {
      case (false, false) => col("ars") <= col("ale")
      case (false, true) => col("ars") < col("ale")
      case (true, false) => col("ale") >= col("ars")
      case (true, true) => col("ale") > col("ars")
    }
    // a theta variant of condA: same value, but the bound references a
    // second attribute — the shape sanity check must refuse it
    val effA =
      if (shape.thetaBound)
        col("als") <= axisExpr(
          col("rsraw") + col("rid") - col("rid") +
            (col("reraw") - col("rsraw")), shape.axis)
      else condA
    val conjuncts = Seq(effA, condB) ++
      (if (shape.extraPred) Seq(col("lid") =!= col("rid")) else Nil) ++
      (if (shape.equiKey) Seq(col("lk") === col("rk")) else Nil)
    val cond = new scala.util.Random(shape.shuffleSeed)
      .shuffle(conjuncts).reduce(_ && _)
    val jt = shape.joinType match {
      case "semi" => "left_semi"
      case "anti" => "left_anti"
      case j => j
    }
    val joined = l.join(r, cond, jt)
    val eligible = !shape.equiKey && !shape.thetaBound
    val out = shape.joinType match {
      case "semi" | "anti" =>
        joined.select(col("lid"), lit(null).cast("long").as("rid"))
      case "right" => joined.select("lid", "rid")
      case _ => joined.select("lid", "rid")
    }
    (out, eligible)
  }

  /** In-Scala oracle over the raw longs (the axis maps are monotone
    * injections; `thetaBound` evaluates like the non-strict A bound).
    */
  def oracle(shape: Shape, ls: List[(Long, Long, Long)],
      rs: List[(Long, Long, Long)])
      : List[(Option[Long], Option[Long])] = {
    def matches(l: (Long, Long, Long), r: (Long, Long, Long)): Boolean = {
      val (lid, lsv, lev) = l; val (rid, rsv, rev) = r
      val aOk =
        if (shape.thetaBound) lsv <= rev
        else if (shape.strictA) lsv < rev else lsv <= rev
      val bOk = if (shape.strictB) rsv < lev else rsv <= lev
      aOk && bOk &&
        (!shape.extraPred || lid != rid) &&
        (!shape.equiKey || lid % 3 == rid % 3)
    }
    val pairs = for { l <- ls; r <- rs if matches(l, r) }
      yield (Option(l._1), Option(r._1))
    val mL = pairs.map(_._1.get).toSet
    val mR = pairs.map(_._2.get).toSet
    val res = shape.joinType match {
      case "inner" => pairs
      case "semi" =>
        ls.collect { case l if mL(l._1) => (Option(l._1), None) }
      case "anti" =>
        ls.collect { case l if !mL(l._1) => (Option(l._1), None) }
      case "left" => pairs ++
        ls.collect { case l if !mL(l._1) => (Option(l._1), None) }
      case "right" => pairs ++
        rs.collect { case r if !mR(r._1) => (None, Option(r._1)) }
      case "full" => pairs ++
        ls.collect { case l if !mL(l._1) => (Option(l._1), None) } ++
        rs.collect { case r if !mR(r._1) => (None, Option(r._1)) }
    }
    res.sortBy(p => (p._1, p._2))
  }
}

object RangeJoinOverlapFuzzPlan
    extends Properties("graft.plans.RangeJoinRewrite.fuzzOverlapPlan") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  private lazy val child = {
    val c = SparkSpec.spark.newSession()
    c.experimental.extraOptimizations = Seq(RangeJoinRewrite(c))
    c.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    c
  }

  property("overlap shapes rewrite exactly when eligible, never crash") =
    forAll(RangeJoinOverlapFuzz.genShape, RangeJoinFuzz.genIvs,
        RangeJoinFuzz.genIvs) { (shape, ls, rs) =>
      child.conf.set("spark.graft.rangeJoin.binSize",
        RangeJoinFuzz.binSizeFor(shape.axis).toString)
      try {
        val (df, eligible) =
          RangeJoinOverlapFuzz.buildJoin(child, shape, ls, rs)
        df.queryExecution.optimizedPlan.toString
          .contains("__gkey") == eligible
      } finally child.conf.unset("spark.graft.rangeJoin.binSize")
    }
}

object RangeJoinOverlapFuzzExec
    extends Properties("graft.plans.RangeJoinRewrite.fuzzOverlapExec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private lazy val child = {
    val c = SparkSpec.spark.newSession()
    c.experimental.extraOptimizations = Seq(RangeJoinRewrite(c))
    c.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    c
  }

  // cap fuzzing matters MOST here: the overlap shape's salted matrix
  // (left-long indexes kind 1 only; right-long indexes kind 2 AND
  // probes kind 1 so long x long lands exactly once; short sides probe
  // the opposite kind) is unreachable by the generated spans at the 256
  // default — cap=1/2 routes both sides long and exercises the full
  // emit-once rendezvous, including inverted intervals down the salts.
  private val genCap = org.scalacheck.Gen.oneOf(1, 2, 8, 256)

  property("overlap rule-on multiset equals the naive semantics, all " +
      "six join types") =
    forAll(RangeJoinOverlapFuzz.genShape, RangeJoinFuzz.genIvs,
        RangeJoinFuzz.genIvs, genCap) { (shape, ls, rs, cap) =>
      child.conf.set("spark.graft.rangeJoin.binSize",
        RangeJoinFuzz.binSizeFor(shape.axis).toString)
      child.conf.set("spark.graft.rangeJoin.maxSpanBuckets", cap.toString)
      try {
        val (df, _) = RangeJoinOverlapFuzz.buildJoin(child, shape, ls, rs)
        val got = df.collect()
          .map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toList.sortBy(p => (p._1, p._2))
        got == RangeJoinOverlapFuzz.oracle(shape, ls, rs)
      } finally {
        child.conf.unset("spark.graft.rangeJoin.binSize")
        child.conf.unset("spark.graft.rangeJoin.maxSpanBuckets")
      }
    }
}

/** 1000+ random shapes at the plan level: optimization must never throw,
  * and the rule must fire on exactly the eligible shapes (both bounds
  * simple and single-attribute, no equi conjunct) regardless of conjunct
  * order, operand flips, strictness, axis type (incl. DECIMAL), or
  * inner/left/full/semi/anti join type.
  */
object RangeJoinRewriteFuzzPlan
    extends Properties("graft.plans.RangeJoinRewrite.fuzzPlan") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private lazy val child = {
    val c = SparkSpec.spark.newSession()
    c.experimental.extraOptimizations = Seq(RangeJoinRewrite(c))
    // tiny generated fixtures: the stats guard must not mask eligibility
    c.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    c
  }

  property("rewrites exactly the eligible shapes, never crashes") =
    forAll(RangeJoinFuzz.genShape, RangeJoinFuzz.genPoints,
        RangeJoinFuzz.genIvs) { (shape, ps, is) =>
      child.conf.set("spark.graft.rangeJoin.binSize",
        RangeJoinFuzz.binSizeFor(shape.axis).toString)
      try {
        val (df, eligible) = RangeJoinFuzz.buildJoin(child, shape, ps, is)
        val plan = df.queryExecution.optimizedPlan.toString
        plan.contains("__gkey") == eligible
      } finally child.conf.unset("spark.graft.rangeJoin.binSize")
    }
}

/** A subset of shapes executed end-to-end: the rule-on result must equal
  * the in-Scala multiset oracle (which IS the naive join's semantics) on
  * every style axis, including LEFT and FULL OUTER null-extension.
  */
object RangeJoinRewriteFuzzExec
    extends Properties("graft.plans.RangeJoinRewrite.fuzzExec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(100)

  private lazy val child = {
    val c = SparkSpec.spark.newSession()
    c.experimental.extraOptimizations = Seq(RangeJoinRewrite(c))
    // tiny generated fixtures: the stats guard must not mask eligibility
    c.conf.set("spark.graft.rangeJoin.smallSideBytes", "0")
    c
  }

  // the cap is fuzzed too: at the 256 default the generated intervals
  // (spans <= ~9 buckets at width 7) NEVER take the salted long-tail
  // arm, so without cap variation the fuzz exec-covers only the tiled
  // kind-0 path. cap=1 routes nearly every interval down the salts,
  // cap=2/8 mixes short and long in one join — exercising the
  // point-probe x all-salts rendezvous for every join type.
  private val genCap = org.scalacheck.Gen.oneOf(1, 2, 8, 256)

  property("rule-on multiset equals the naive semantics") =
    forAll(RangeJoinFuzz.genShape, RangeJoinFuzz.genPoints,
        RangeJoinFuzz.genIvs, genCap) { (shape, ps, is, cap) =>
      child.conf.set("spark.graft.rangeJoin.binSize",
        RangeJoinFuzz.binSizeFor(shape.axis).toString)
      child.conf.set("spark.graft.rangeJoin.maxSpanBuckets", cap.toString)
      try {
        val (df, _) = RangeJoinFuzz.buildJoin(child, shape, ps, is)
        val got = df.collect()
          .map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toList.sortBy(r => (r._1, r._2))
        got == RangeJoinFuzz.oracle(shape, ps, is)
      } finally {
        child.conf.unset("spark.graft.rangeJoin.binSize")
        child.conf.unset("spark.graft.rangeJoin.maxSpanBuckets")
      }
    }
}
