package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-based invariants for the round-13 tiers: the profiler must
  * agree with directly computed per-column aggregates, the keyed diff
  * with a driver-side reference diff, the checksum tier with a
  * driver-side fold, and the prefix-filter ssjoin with brute force at
  * RANDOM thresholds — the review's ceil-overshoot hole lived exactly in
  * the threshold corners a fixed-threshold spec missed. Row counts kept
  * small; each case spins Spark jobs.
  */
object ObservabilityProperties
    extends Properties("graft.operators.observability") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val genRow: Gen[(Long, Option[Long], Option[String])] = for {
    k <- Gen.choose(0L, 30L)
    v <- Gen.option(Gen.choose(-100L, 100L))
    s <- Gen.option(Gen.oneOf("a", "b", "cc", "ddd"))
  } yield (k, v, s)

  private val genTable = Gen.nonEmptyListOf(genRow)
    .map(_.take(40))

  property("columnProfile agrees with directly computed aggregates") =
    forAll(genTable) { rows =>
      val df = rows.toDF("k", "v", "s")
      val got = Profile.columnProfile(df, Seq("v", "s"))
        .as[(String, Long, Long, Long, String, String)]
        .collect().map(r => r._1 -> r).toMap
      val vs = rows.flatMap(_._2)
      val ss = rows.flatMap(_._3)
      val n = rows.length.toLong
      val vOk = got("v") == (("v", n, vs.length.toLong,
        vs.distinct.length.toLong,
        if (vs.isEmpty) null else vs.min.toString,
        if (vs.isEmpty) null else vs.max.toString))
      val sOk = got("s") == (("s", n, ss.length.toLong,
        ss.distinct.length.toLong,
        if (ss.isEmpty) null else ss.min,
        if (ss.isEmpty) null else ss.max))
      vOk && sOk
    }

  property("diffSummary counts match a driver-side reference diff " +
      "(unique keys, random perturbation)") =
    forAll(genTable, genTable) { (ra, rb) =>
      // unique keys per side: reconciliation's documented contract
      val a = ra.distinctBy(_._1)
      val b = rb.distinctBy(_._1)
      val df = Reconcile.diffSummary(
        a.toDF("k", "v", "s"), b.toDF("k", "v", "s"), Seq("k"))
        .as[(String, Long)].collect().toMap
      val am = a.map(r => r._1 -> (r._2, r._3)).toMap
      val bm = b.map(r => r._1 -> (r._2, r._3)).toMap
      val both = am.keySet.intersect(bm.keySet)
      df("only_in_a") == (am.keySet -- bm.keySet).size.toLong &&
      df("only_in_b") == (bm.keySet -- am.keySet).size.toLong &&
      df("in_both") == both.size.toLong &&
      df("diff:v") == both.count(k => am(k)._1 != bm(k)._1).toLong &&
      df("diff:s") == both.count(k => am(k)._2 != bm(k)._2).toLong
    }

  property("columnChecksums equals a driver-side fold of the portable " +
      "encoding") =
    forAll(genTable) { rows =>
      val df = rows.toDF("k", "v", "s")
      val M = 1000003L
      def pm(x: Long) = ((x % M) + M) % M
      def foldStr(s: String) =
        s.foldLeft(0L)((h, c) => pm(h * 31 + c.toLong))
      val got = Reconcile.columnChecksums(df, Seq("v", "s"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
      val vs = rows.flatMap(_._2)
      val ss = rows.flatMap(_._3)
      got("v") == (("v", vs.length.toLong, vs.map(pm).sum)) &&
      got("s") == (("s", ss.length.toLong, ss.map(foldStr).sum))
    }

  private val genArrRow: Gen[(Long, Option[List[Option[Long]]])] = for {
    k <- Gen.choose(0L, 30L)
    a <- Gen.option(
      Gen.listOf(Gen.option(Gen.choose(-50L, 50L))).map(_.take(6)))
  } yield (k, a)

  property("array checksums equal a driver-side ordered fold (init 1, " +
      "null-element sentinel, null arrays skipped)") =
    forAll(Gen.nonEmptyListOf(genArrRow).map(_.take(30))) { rows =>
      val df = rows.toDF("k", "arr")
      val M = 1000003L
      def pm(x: Long) = ((x % M) + M) % M
      def foldArr(a: List[Option[Long]]) =
        a.foldLeft(1L)((h, e) => pm(h * 31 + e.map(pm).getOrElse(M)))
      val got = Reconcile.columnChecksums(df, Seq("arr"))
        .as[(String, Long, Long)].collect().head
      val as = rows.flatMap(_._2)
      got == (("arr", as.length.toLong, as.map(foldArr).sum))
    }

  private val genDoc: Gen[String] =
    Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("red", "blue", "fox", "dog", "run",
        "day", "sky", "sea")).map(_.mkString(" ")))

  property("prefixFilterPairs equals brute force at RANDOM thresholds " +
      "(full recall over the whole threshold range)") =
    forAll(Gen.listOfN(10, genDoc), Gen.choose(1, 99)) { (docs, tPct) =>
      val t = tPct / 100.0
      val corpus = docs.zipWithIndex
        .map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "text")
      val sets = corpus.select(col("doc_id"),
        Dedup.shinglesOf(corpus, "text", 3).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = (for {
        ia <- sets.keys; ib <- sets.keys if ia < ib
        i = sets(ia).toSet.intersect(sets(ib).toSet).size
        u = sets(ia).size + sets(ib).size - i
        j = i.toDouble / u if j >= t
      } yield (ia, ib, j)).toSeq.sorted
      val got = Dedup.prefixFilterPairs(corpus, "text", "doc_id", t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      got == want
    }
}
