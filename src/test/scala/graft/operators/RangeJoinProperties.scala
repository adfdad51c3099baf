package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence laws for [[RangeJoin.intervalOverlap]]: for ANY
  * interval sets and ANY bucket width, the bucketized join must equal the
  * naive quadratic overlap join as a MULTISET (exactly-once emission, not
  * just set membership). Interval coordinates include negatives so the
  * floor-bucket arithmetic is exercised on both sides of zero.
  */
object RangeJoinProperties extends Properties("graft.operators.RangeJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val genIv: Gen[(Long, Long)] = for {
    s <- Gen.choose(-100L, 100L)
    len <- Gen.choose(-5L, 60L) // negative/zero length: must never pair
  } yield (s, s + len)

  private def genSide(n: Int): Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(n, genIv).map(_.zipWithIndex.map { case ((s, e), i) =>
      (i.toLong, s, e)
    })

  private val genWidth = Gen.oneOf(1L, 3L, 7L, 16L, 64L, 1000L)

  property("equals the naive overlap join as a multiset, any width") =
    forAll(genSide(25), genSide(25), genWidth) { (ls, rs, w) =>
      val l = ls.toDF("lid", "ls", "le")
      val r = rs.toDF("rid", "rs", "re")
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().toList.sorted
      val want = (for {
        (li, lsv, lev) <- ls if lev > lsv
        (ri, rsv, rev) <- rs if rev > rsv
        if math.max(lsv, rsv) < math.min(lev, rev)
      } yield (li, ri)).sorted
      got == want
    }

  property("long-tail guard: equality holds at ANY maxSpanBuckets cap") =
    forAll(genSide(20), genSide(20), genWidth,
        Gen.choose(1, 8)) { (ls, rs, w, cap) =>
      // a tiny cap forces arbitrary slices of the data down the salted
      // long-tail route; the multiset result must not move
      val l = ls.toDF("lid", "ls", "le")
      val r = rs.toDF("rid", "rs", "re")
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w,
          maxSpanBuckets = cap)
        .select("lid", "rid").as[(Long, Long)].collect().toList.sorted
      val want = (for {
        (li, lsv, lev) <- ls if lev > lsv
        (ri, rsv, rev) <- rs if rev > rsv
        if math.max(lsv, rsv) < math.min(lev, rev)
      } yield (li, ri)).sorted
      got == want
    }

  property("pointInIntervalLeftOuter equals the naive LEFT JOIN " +
      "multiset at any width and long-tail cap") =
    forAll(genSide(18), genSide(12), genWidth,
        Gen.choose(1, 8)) { (psRaw, ivsRaw, w, cap) =>
      // reuse the interval generator for points: (pid, x, ignored)
      val ps = psRaw.map { case (i, s, _) => (i, s) }
      val points = ps.toDF("pid", "x")
      val ivs = ivsRaw.toDF("iid", "s", "e")
      val got = RangeJoin.pointInIntervalLeftOuter(points, ivs, "x", "s",
          "e", bucketWidth = w, maxSpanBuckets = cap)
        .select("pid", "iid").as[(Long, Option[Long])]
        .collect().toList.sortBy(r => (r._1, r._2))
      val want = ps.flatMap { case (pid, x) =>
        val m = ivsRaw.filter { case (_, s, e) => s <= x && x <= e }
          .map(_._1)
        if (m.nonEmpty) m.map(iid => (pid, Some(iid)))
        else List((pid, None))
      }.sortBy(r => (r._1, r._2))
      got == want
    }

  property("pointInIntervalLeftSemi/Anti equal the naive LEFT SEMI/ANTI" +
      " multisets at any width and long-tail cap, and partition the " +
      "points") =
    forAll(genSide(18), genSide(12), genWidth,
        Gen.choose(1, 8)) { (psRaw, ivsRaw, w, cap) =>
      val ps = psRaw.map { case (i, s, _) => (i, s) }
      val points = ps.toDF("pid", "x")
      val ivs = ivsRaw.toDF("iid", "s", "e")
      def run(anti: Boolean) = (if (anti)
          RangeJoin.pointInIntervalLeftAnti(points, ivs, "x", "s", "e",
            bucketWidth = w, maxSpanBuckets = cap)
        else
          RangeJoin.pointInIntervalLeftSemi(points, ivs, "x", "s", "e",
            bucketWidth = w, maxSpanBuckets = cap))
        .select("pid").as[Long].collect().toList.sorted
      val covered = ps.collect { case (pid, x)
          if ivsRaw.exists { case (_, s, e) => s <= x && x <= e } => pid }
        .sorted
      val uncovered = ps.map(_._1).diff(covered).sorted
      run(anti = false) == covered && run(anti = true) == uncovered
    }

  property("intervalOverlap outer/semi/anti equal the naive half-open " +
      "overlap joins at any width and cap") =
    forAll(genSide(15), genSide(12), genWidth,
        Gen.choose(1, 8)) { (lsRaw, rsRaw, w, cap) =>
      val l = lsRaw.toDF("lid", "lls", "lle")
      val r = rsRaw.toDF("rid", "rrs", "rre")
      def m(li: (Long, Long, Long), ri: (Long, Long, Long)) = {
        val ok = li._3 > li._2 && ri._3 > ri._2 &&
          math.max(li._2, ri._2) < math.min(li._3, ri._3)
        ok
      }
      val mL = (for { a <- lsRaw; b <- rsRaw if m(a, b) } yield a._1).toSet
      val mR = (for { a <- lsRaw; b <- rsRaw if m(a, b) } yield b._1).toSet
      val semi = RangeJoin.intervalOverlapLeftSemi(l, r, "lls", "lle",
          "rrs", "rre", w, maxSpanBuckets = cap)
        .select("lid").as[Long].collect().toList.sorted
      val anti = RangeJoin.intervalOverlapLeftAnti(l, r, "lls", "lle",
          "rrs", "rre", w, maxSpanBuckets = cap)
        .select("lid").as[Long].collect().toList.sorted
      val louter = RangeJoin.intervalOverlapLeftOuter(l, r, "lls", "lle",
          "rrs", "rre", w, maxSpanBuckets = cap)
        .select("lid", "rid").as[(Long, Option[Long])]
        .collect().toList.sortBy(p => (p._1, p._2))
      val router = RangeJoin.intervalOverlapRightOuter(l, r, "lls", "lle",
          "rrs", "rre", w, maxSpanBuckets = cap)
        .select("lid", "rid").as[(Option[Long], Long)]
        .collect().toList.sortBy(p => (p._2, p._1))
      val fouter = RangeJoin.intervalOverlapFullOuter(l, r, "lls", "lle",
          "rrs", "rre", w, maxSpanBuckets = cap)
        .select("lid", "rid").as[(Option[Long], Option[Long])]
        .collect().toList.sortBy(p => (p._1, p._2))
      val pairs = for { a <- lsRaw; b <- rsRaw if m(a, b) }
        yield (a._1, b._1)
      val wantL = (pairs.map { case (a, b) => (a, Option(b)) } ++
        lsRaw.collect { case a if !mL(a._1) => (a._1, None) })
        .sortBy(p => (p._1, p._2))
      val wantR = (pairs.map { case (a, b) => (Option(a), b) } ++
        rsRaw.collect { case b if !mR(b._1) =>
          (Option.empty[Long], b._1) })
        .sortBy(p => (p._2, p._1))
      val wantF = (pairs.map { case (a, b) => (Option(a), Option(b)) } ++
        lsRaw.collect { case a if !mL(a._1) =>
          (Option(a._1), Option.empty[Long]) } ++
        rsRaw.collect { case b if !mR(b._1) =>
          (Option.empty[Long], Option(b._1)) })
        .sortBy(p => (p._1, p._2))
      semi == lsRaw.map(_._1).filter(mL).sorted &&
        anti == lsRaw.map(_._1).filterNot(mL).sorted &&
        louter == wantL && router == wantR && fouter == wantF
    }

  property("bandJoinLeftOuter equals the naive |l - r| <= tol LEFT " +
      "JOIN with extra keys") =
    forAll(genSide(15), genSide(15), Gen.choose(0L, 20L)) { (ls, rs, tol) =>
      val left = ls.map { case (i, v, _) => (i, i % 2, v) }
        .toDF("lid", "k", "lv")
      val right = rs.map { case (i, v, _) => (i, i % 2, v) }
        .toDF("rid", "k", "rv")
      val got = RangeJoin.bandJoinLeftOuter(left, right, "lv", "rv",
          tolerance = tol, extraKeys = Seq("k"))
        .select("lid", "rid").as[(Long, Option[Long])]
        .collect().toList.sortBy(r => (r._1, r._2))
      val want = ls.flatMap { case (li, lv, _) =>
        val m = rs.filter { case (ri, rv, _) =>
          li % 2 == ri % 2 && math.abs(lv - rv) <= tol
        }.map(_._1)
        if (m.nonEmpty) m.map(ri => (li, Some(ri)))
        else List((li, None))
      }.sortBy(r => (r._1, r._2))
      got == want
    }

  property("extraKeys restrict pairing to the key, still exactly once") =
    forAll(genSide(20), genSide(20), genWidth) { (ls, rs, w) =>
      val l = ls.map { case (i, s, e) => (i, i % 3, s, e) }
        .toDF("lid", "k", "ls", "le")
      val r = rs.map { case (i, s, e) => (i, i % 3, s, e) }
        .toDF("rid", "k", "rs", "re")
      val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", w,
          extraKeys = Seq("k"))
        .select("lid", "rid").as[(Long, Long)].collect().toList.sorted
      val want = (for {
        (li, lsv, lev) <- ls if lev > lsv
        (ri, rsv, rev) <- rs if rev > rsv
        if li % 3 == ri % 3
        if math.max(lsv, rsv) < math.min(lev, rev)
      } yield (li, ri)).sorted
      got == want
    }
}
