package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** Property law for the incremental-dedup manifest commit protocol:
  * over RANDOM corpora, random batch splits, and a random crash point
  * injected into a random fold, the crash+retry sequence yields exactly
  * the one-shot greedy dedup's survivor set — the atomicity guarantee
  * stated as an end-to-end semantic law rather than per-interleaving
  * snapshots (those live in [[IncrementalStateCommitSpec]]).
  *
  * Case counts kept low: every case runs two full fold sequences of
  * Spark jobs plus a one-shot reference.
  */
object StateCommitProperties extends Properties("graft.statecommit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // small vocabulary => guaranteed near-dup collisions across batches
  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(6, 10)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
  } yield ws.mkString(" ")

  private val genCase: Gen[(List[String], Int, Int, Int)] = for {
    docs <- Gen.listOfN(14, genDoc)
    split <- Gen.choose(4, 10) // batch boundary (ids are monotone)
    crashFold <- Gen.choose(0, 1) // which fold the crash hits
    crashAfter <- Gen.choose(0, 3) // writes completed before the crash
  } yield (docs, split, crashFold, crashAfter)

  property("crash at a random point + retry == one-shot greedy dedup") =
    forAll(genCase) { case (docs, split, crashFold, crashAfter) =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val batches = Seq(
        df.filter(org.apache.spark.sql.functions.col("doc_id") < split),
        df.filter(org.apache.spark.sql.functions.col("doc_id") >= split))
      val prefix = s"scprop_${System.nanoTime()}"
      try {
        val survivors = batches.zipWithIndex.flatMap { case (b, i) =>
          if (i == crashFold) {
            // the injected attempt dies between state writes...
            intercept[IllegalStateException] {
              Dedup.incrementalMinhashDedupImpl(b, prefix, "text",
                "doc_id", 3, 64, 16, 0.6, 42L, 2, 1000, None, crashAfter)
            }
            () // ...and the caller retries the same batch
          }
          val s = Dedup.incrementalMinhashDedup(b, prefix, "text",
            "doc_id", threshold = 0.6, buckets = 2)
          val ids = s.select("doc_id").as[Long].collect().toSet
          s.unpersist()
          ids
        }.toSet
        val oneShot = Dedup.minhashDedup(df, "text", "doc_id",
          threshold = 0.6)
          .select("doc_id").as[Long].collect().toSet
        Prop(survivors == oneShot) :| s"folds=$survivors one-shot=$oneShot"
      } finally Dedup.dropIncrementalDedupState(spark, prefix)
    }

  private def intercept[T <: Throwable](body: => Any)(
      implicit ct: scala.reflect.ClassTag[T]): T =
    try { body; sys.error(s"expected ${ct.runtimeClass.getName}") }
    catch { case t: Throwable if ct.runtimeClass.isInstance(t) =>
      t.asInstanceOf[T] }
}
