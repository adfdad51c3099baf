package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Property-based invariants over randomly generated dirty tables
  * (SURVEY.md §5 / FIXTURES.md §C): dedup uniqueness and idempotence, null
  * policy totality, orphan-rate zero after conformance. Row counts kept small
  * — each case spins Spark jobs.
  */
object DedupProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val genRow: Gen[(Int, Int, Option[Int])] = for {
    key <- Gen.choose(0, 8) // few keys => guaranteed duplicates
    ord <- Gen.choose(0, 100)
    pay <- Gen.option(Gen.choose(0, 1000))
  } yield (key, ord, pay)

  private val genTable = Gen.listOfN(40, genRow)

  property("dedup yields unique keys and a subset of input") =
    forAll(genTable) { rows =>
      val df = rows.toDF("k", "ord", "pay")
      val out = DedupLatest(df, Seq("k"), "ord", extraTiebreak = Seq("pay"))
      val keys = out.select("k").as[Int].collect()
      val inKeys = rows.map(_._1).toSet
      keys.toSet == inKeys && keys.length == keys.distinct.length
    }

  property("dedup keeps the max order value per key") =
    forAll(genTable) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("k", "ord", "pay")
        val out = DedupLatest(df, Seq("k"), "ord", extraTiebreak = Seq("pay"))
          .select("k", "ord").as[(Int, Int)].collect().toMap
        val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        out == want
      }
    }

  property("dedup is idempotent") =
    forAll(genTable) { rows =>
      val df = rows.toDF("k", "ord", "pay")
      val once = DedupLatest(df, Seq("k"), "ord", extraTiebreak = Seq("pay"))
      val twice = DedupLatest(once, Seq("k"), "ord", extraTiebreak = Seq("pay"))
      once.collect().toSet == twice.collect().toSet
    }

  property("viaAggregate agrees with the window formulation") =
    forAll(genTable) { rows =>
      // make (key, ord, pay) unique so both tiebreak paths are deterministic
      val uniq = rows.distinct
      val df = uniq.toDF("k", "ord", "pay")
      val a = DedupLatest(df, Seq("k"), "ord", extraTiebreak = Seq("pay"))
        .collect().map(_.toSeq).toSet
      val b = DedupLatest.viaAggregate(df, Seq("k"), "ord",
        extraTiebreak = Seq("pay")).collect().map(_.toSeq).toSet
      a == b
    }

  property("null policies are total") =
    forAll(genTable) { rows =>
      val df = rows.toDF("k", "ord", "pay")
      val dropped = NullPolicy(df, "pay", NullPolicy.DropRow)
      val defaulted = NullPolicy(df, "pay", NullPolicy.Default(0))
      val unknowned = NullPolicy(df, "pay", NullPolicy.ToUnknown(-1))
      dropped.filter($"pay".isNull).count() == 0L &&
        defaulted.filter($"pay".isNull).count() == 0L &&
        unknowned.filter($"pay".isNull).count() == 0L &&
        defaulted.count() == rows.length.toLong &&
        unknowned.count() == rows.length.toLong
    }

  property("orphan rate is zero after MapToUnknown conformance") =
    forAll(genTable, Gen.listOfN(5, Gen.choose(0, 4))) { (rows, dimKeys) =>
      (rows.nonEmpty && dimKeys.nonEmpty) ==> {
        val fact = rows.toDF("fk", "ord", "pay")
        val dim = dimKeys.distinct.toDF("pk")
        val conformed = Conform.fact(fact, "fk", dim, "pk",
          OrphanPolicy.MapToUnknown(-1))
        val dimPlus = Conform.withUnknownMember(dim, "pk", unknownKey = -1)
        graft.dq.Checks.orphanRate(conformed, "fk", dimPlus, "pk") == 0.0 &&
          conformed.count() == rows.length.toLong
      }
    }

  implicit private class PropOps(b: Boolean) {
    def ==>(that: => Boolean): Prop = Prop(!b || that)
  }
}
