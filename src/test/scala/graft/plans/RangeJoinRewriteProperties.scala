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

  property("rule-on multiset equals the naive semantics") =
    forAll(RangeJoinFuzz.genShape, RangeJoinFuzz.genPoints,
        RangeJoinFuzz.genIvs) { (shape, ps, is) =>
      child.conf.set("spark.graft.rangeJoin.binSize",
        RangeJoinFuzz.binSizeFor(shape.axis).toString)
      try {
        val (df, _) = RangeJoinFuzz.buildJoin(child, shape, ps, is)
        val got = df.collect()
          .map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toList.sortBy(r => (r._1, r._2))
        got == RangeJoinFuzz.oracle(shape, ps, is)
      } finally child.conf.unset("spark.graft.rangeJoin.binSize")
    }
}
