package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("deterministic split is disjoint, exhaustive, and reproducible") {
    val (train1, test1) = Sampling.deterministicSplit(docs, "doc_id", 100)
    val (train2, test2) = Sampling.deterministicSplit(docs, "doc_id", 100)
    assert(train1.count() + test1.count() == docs.count())
    assert(train1.join(test1, Seq("doc_id"), "inner").count() == 0)
    assert(test1.select("doc_id").as[Long].collect().sorted.toSeq ==
      test2.select("doc_id").as[Long].collect().sorted.toSeq)
    // ~10% expected; hash-uniform so allow generous tolerance at n=500
    val frac = test1.count().toDouble / docs.count()
    assert(frac > 0.04 && frac < 0.18, s"test fraction $frac")
    assert(train1.count() == train2.count())
  }

  test("split survives repartitioning (randomSplit does not guarantee this)") {
    val (_, testA) = Sampling.deterministicSplit(docs, "doc_id", 100)
    val (_, testB) = Sampling.deterministicSplit(docs.repartition(13), "doc_id", 100)
    assert(testA.select("doc_id").as[Long].collect().sorted.toSeq ==
      testB.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("stratified sampling respects per-stratum fractions") {
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0)
    val sampled = Sampling.stratified(docs, "lang", fractions)
    val counts = sampled.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val base = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(counts("de") == base("de")) // fraction 1.0 keeps all
    assert(!counts.contains("fr") || counts("fr") == 0L)
    val enFrac = counts.getOrElse("en", 0L).toDouble / base("en")
    assert(enFrac > 0.25 && enFrac < 0.75, s"en fraction $enFrac")
    // unlisted strata default to fraction 0
    assert(!counts.contains("es"))
  }
}
