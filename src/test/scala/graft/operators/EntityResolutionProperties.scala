package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized laws for the budget-guarded blocking tier
  * ([[EntityResolution.guardedCandidatePairs]] /
  * [[EntityResolution.guardedBlockAccounting]]): for ANY name
  * distribution (including heavy duplicate skew), ANY budget, and the
  * standard prefix/char split chain, the distributed fused cascade must
  * equal a driver-side REFERENCE implementation of the same refinement
  * semantics — pairs as a set, accounting row by row. This is the
  * equivalence that lets the one-aggregation-per-level fusion replace
  * the count-plus-join cascade without trusting either: both must match
  * the obviously-correct sequential model.
  */
object EntityResolutionProperties
    extends Properties("graft.operators.EntityResolution") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // names over a tiny alphabet with geometric duplication so blocks
  // range from singletons to corpus-wide degenerate keys
  private val genName: Gen[String] = for {
    a <- Gen.oneOf("aa", "ab", "ba")
    b <- Gen.oneOf("x", "y")
    c <- Gen.oneOf("0", "1", "2", "3")
  } yield a + b + c

  private def genRows(n: Int): Gen[List[(Long, String)]] =
    Gen.listOfN(n, genName).map(_.zipWithIndex.map { case (s, i) =>
      (i.toLong, s)
    })

  /** Driver-side reference: the sequential refinement cascade over
    * in-memory rows. keys/splits are (name -> String) functions
    * mirroring the Column expressions handed to the operator.
    */
  private def reference(rows: List[(Long, String)],
      keys: List[String => String], splits: List[String => String],
      cap: Long): (Set[(Long, Long)], Set[(Long, Long, String, Long, Long, Long, Long)]) = {
    val pairsOut = Set.newBuilder[(Long, Long)]
    // ledger: (pass, level, fate, bk) -> member count
    val ledger = scala.collection.mutable.Map[(Long, Long, String, String), Long]()
    for ((kf, pass) <- keys.zipWithIndex) {
      var cur: List[(Long, String, String)] = // (id, name, key)
        rows.map { case (id, n) => (id, n, kf(n)) }
          .filter(_._3 != null)
      for (lvl <- 0 to splits.length) {
        val grouped = cur.groupBy(_._3)
        val (kept, over) = grouped.partition(_._2.size <= cap)
        for ((bk, members) <- kept)
          ledger((pass.toLong, lvl.toLong, "kept", bk)) = members.size
        if (lvl < splits.length) {
          cur = over.values.flatten.toList.map { case (id, n, k) =>
            (id, n, k + "\u0001" + Option(splits(lvl)(n)).getOrElse("\u0002"))
          }
        } else {
          for ((bk, members) <- over)
            ledger((pass.toLong, lvl.toLong, "dropped", bk)) = members.size
        }
        for ((_, members) <- kept; a <- members; b <- members
            if a._1 < b._1)
          pairsOut += ((a._1, b._1))
        if (lvl == splits.length) cur = Nil
      }
    }
    val acct = ledger.toSeq
      .groupBy { case ((pass, lvl, fate, _), _) => (pass, lvl, fate) }
      .map { case ((pass, lvl, fate), blocks) =>
        val sizes = blocks.map(_._2)
        (pass, lvl, fate, blocks.size.toLong, sizes.sum,
          sizes.max, sizes.map(c => c * (c - 1) / 2).sum)
      }.toSet
    (pairsOut.result(), acct)
  }

  private val keyFns: List[String => String] =
    List(n => n.substring(0, 2), n => n.substring(n.length - 1))
  private val splitFns: List[String => String] =
    List(n => n.substring(2, 3), n => n.substring(3, 4))
  private def keyCols = Seq(
    substring(col("name"), 1, 2), substring(col("name"), -1, 1))
  private def splitCols = Seq(
    substring(col("name"), 3, 1), substring(col("name"), 4, 1))

  property("guarded pairs and accounting equal the sequential " +
      "reference cascade at any budget") =
    forAll(genRows(40), Gen.choose(1L, 120L)) { (rows, budget) =>
      val cap = EntityResolution.sizeCapFor(budget)
      val df = rows.toDF("id", "name")
      val got = EntityResolution.guardedCandidatePairs(df, "id",
        keyCols, splitCols, maxBlockPairs = budget)
        .as[(Long, Long)].collect().toSet
      val gotAcct = EntityResolution.guardedBlockAccounting(df, "id",
        keyCols, splitCols, maxBlockPairs = budget)
        .as[(Long, Long, String, Long, Long, Long, Long)].collect().toSet
      val (wantPairs, wantAcct) =
        reference(rows, keyFns, splitFns, cap)
      got == wantPairs && gotAcct == wantAcct
    }

  property("guarded pairs are a subset of unguarded pairs, and equal " +
      "them when the budget covers the largest block") =
    forAll(genRows(30), Gen.choose(1L, 40L)) { (rows, budget) =>
      val df = rows.toDF("id", "name")
      val guarded = EntityResolution.guardedCandidatePairs(df, "id",
        keyCols, splitCols, maxBlockPairs = budget)
        .as[(Long, Long)].collect().toSet
      val plain = EntityResolution.candidatePairs(df, "id", keyCols)
        .as[(Long, Long)].collect().toSet
      val bigBudget = EntityResolution.guardedCandidatePairs(df, "id",
        keyCols, splitCols, maxBlockPairs = 1000000L)
        .as[(Long, Long)].collect().toSet
      guarded.subsetOf(plain) && bigBudget == plain
    }
}
