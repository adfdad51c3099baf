package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Property-based invariants for the similarity/dedup primitives added in
  * round 2: weighted Jaccard metric laws, ICWS signature determinism and
  * containment, SimHash/Hamming basics. Cases drive Catalyst expressions
  * through real (tiny) DataFrames — each case is a Spark job, so counts
  * stay small.
  */
object SimilarityProperties extends Properties("graft.similarity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(1, 25)
    toks <- Gen.listOfN(n, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"))
  } yield toks.mkString(" ")

  private def tfJaccard(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(Dedup.weightedJaccard(
        Dedup.shingleTf($"a", 2)("hashes"), Dedup.shingleTf($"a", 2)("weights"),
        Dedup.shingleTf($"b", 2)("hashes"), Dedup.shingleTf($"b", 2)("weights"))
        .as("j"))
      .head().getDouble(0)

  property("weighted jaccard: identity, symmetry, bounds") =
    forAll(genDoc, genDoc) { (a, b) =>
      val jaa = tfJaccard(a, a)
      val jab = tfJaccard(a, b)
      val jba = tfJaccard(b, a)
      jaa == 1.0 && jab == jba && jab >= 0.0 && jab <= 1.0
    }

  // needs >= 2 tokens: a single-token doc degenerates to a whole-doc
  // shingle that k=2 shingles of the longer doc never contain
  private val genDoc2: Gen[String] = for {
    n <- Gen.choose(2, 25)
    toks <- Gen.listOfN(n, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"))
  } yield toks.mkString(" ")

  property("weighted jaccard dominates on containment: J(a, a++b) > 0") =
    forAll(genDoc2, genDoc) { (a, b) =>
      tfJaccard(a, a + " " + b) > 0.0
    }

  property("ICWS signatures are deterministic and equal for equal bags") =
    forAll(genDoc) { a =>
      val sigs = Seq((a, a)).toDF("x", "y")
        .select(
          Dedup.icwsSignature(Dedup.shingleTf($"x", 2)("hashes"),
            Dedup.shingleTf($"x", 2)("weights"), 16).as("s1"),
          Dedup.icwsSignature(Dedup.shingleTf($"y", 2)("hashes"),
            Dedup.shingleTf($"y", 2)("weights"), 16).as("s2"))
        .head()
      sigs.getSeq[Long](0) == sigs.getSeq[Long](1)
    }

  property("ICWS signature slots differ for disjoint-vocabulary docs") =
    forAll(Gen.choose(1, 5)) { n =>
      // shared slots between disjoint docs should be rare (expected 0 of 32)
      val a = Seq.fill(n)("alpha beta gamma").mkString(" ")
      val b = Seq.fill(n)("omega psi chi").mkString(" ")
      val r = Seq((a, b)).toDF("x", "y")
        .select(
          Dedup.icwsSignature(Dedup.shingleTf($"x", 2)("hashes"),
            Dedup.shingleTf($"x", 2)("weights"), 32).as("s1"),
          Dedup.icwsSignature(Dedup.shingleTf($"y", 2)("hashes"),
            Dedup.shingleTf($"y", 2)("weights"), 32).as("s2"))
        .head()
      val same = r.getSeq[Long](0).zip(r.getSeq[Long](1)).count(t => t._1 == t._2)
      same <= 2
    }

  property("simhash: zero distance to self; distance symmetric") =
    forAll(genDoc, genDoc) { (a, b) =>
      val r = Seq((a, b)).toDF("x", "y")
        .select(
          Dedup.hammingDist(Dedup.simhash64($"x"), Dedup.simhash64($"x"))
            .as("dxx"),
          Dedup.hammingDist(Dedup.simhash64($"x"), Dedup.simhash64($"y"))
            .as("dxy"),
          Dedup.hammingDist(Dedup.simhash64($"y"), Dedup.simhash64($"x"))
            .as("dyx"))
        .head()
      // bit_count returns int
      r.getInt(0) == 0 && r.getInt(1) == r.getInt(2)
    }
}
