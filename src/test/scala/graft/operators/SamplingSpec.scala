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

  test("mixture sampling tracks per-source token budgets deterministically") {
    import org.apache.spark.sql.functions._
    // three synthetic sources with known token masses: a=2000, b=2000,
    // c=200 tokens (c small enough that its rate caps at 1.0)
    val rows = (0 until 200).map { i =>
      val src = if (i < 100) "a" else if (i < 180) "b" else "c"
      val nTok = if (src == "b") 25 else if (src == "a") 20 else 10
      (i.toLong, src, Seq.fill(nTok)("w").mkString(" "))
    }
    val df = rows.toDF("doc_id", "source", "text")
    val weights = Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5)
    val out = Sampling.mixtureSample(df, "text", "doc_id", "source",
      weights, tokenBudget = 2000L)
    val got = out.groupBy("source")
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")))
        .as("tok"))
      .as[(String, Long)].collect().toMap
    // c: budget share 1000 > mass 200 -> rate caps at 1, ALL of c kept
    assert(got("c") == 200L)
    // a and b target 500 tokens each; multiplicative-hash sampling is
    // near-uniform, allow +-50%
    assert(got("a") > 250 && got("a") < 750, s"a tokens ${got("a")}")
    assert(got("b") > 250 && got("b") < 750, s"b tokens ${got("b")}")
    // deterministic: same input -> identical sample
    val again = Sampling.mixtureSample(df, "text", "doc_id", "source",
      weights, tokenBudget = 2000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.select("doc_id").as[Long].collect().sorted.toSeq)
    // unknown sources are dropped (weight 0)
    val extra = Sampling.mixtureSample(
      df.withColumn("source", lit("unknown")), "text", "doc_id", "source",
      weights, tokenBudget = 2000L)
    assert(extra.count() == 0)
  }

  test("mixture sampling is partition-layout invariant") {
    import org.apache.spark.sql.functions._
    val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      Sampling.mixtureSample(d, "text", "doc_id", "source", weights, 5000L)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("source")))
    val c = ids(docs.coalesce(1))
    assert(a == b && b == c,
      "sample must depend only on ids, never on partitioning")
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

  test("temperatureWeights: normalized, order-preserving, and flattening " +
      "toward uniform as tau decreases") {
    val masses = Map("a" -> 1000L, "b" -> 100L, "c" -> 10L)
    val w7 = Sampling.temperatureWeights(masses, tau = 0.7)
    assert(math.abs(w7.values.sum - 1.0) < 1e-12)
    assert(w7("a") > w7("b") && w7("b") > w7("c"))
    // tau = 1 reproduces the natural distribution exactly
    val w1 = Sampling.temperatureWeights(masses, tau = 1.0)
    assert(math.abs(w1("a") - 1000.0 / 1110.0) < 1e-12)
    // lower tau lifts the tail relative to its natural share
    val w3 = Sampling.temperatureWeights(masses, tau = 0.3)
    assert(w3("c") > w7("c") && w7("c") > w1("c"))
    assert(w3("a") < w7("a") && w7("a") < w1("a"))
  }

  test("sourceQuota keeps the top-quota rows per source by (score, id)") {
    import org.apache.spark.sql.functions._
    // source a: 5 rows, two tied at the cut score — id breaks the tie;
    // source b: fewer rows than the quota — all kept
    val rows = Seq(
      (1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.5),
      (4L, "a", 0.5), (5L, "a", 0.1),
      (10L, "b", 0.2), (11L, "b", 0.3))
    val df = rows.toDF("doc_id", "source", "score")
    val kept = Sampling.sourceQuota(df, "source", "doc_id", col("score"), 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 10L, 11L))
    // quota >= group size keeps everything
    assert(Sampling.sourceQuota(df, "source", "doc_id", col("score"), 100)
      .count() == rows.size)
  }

  test("sourceQuota is partition-invariant and never exceeds the quota") {
    import org.apache.spark.sql.functions._
    val scored = docs.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
    val a = Sampling.sourceQuota(scored, "source", "doc_id", col("q"), 5)
    val b = Sampling.sourceQuota(scored.repartition(17), "source", "doc_id",
      col("q"), 5)
    assert(a.select("doc_id").as[Long].collect().sorted.toSeq ==
      b.select("doc_id").as[Long].collect().sorted.toSeq)
    val maxPerSource = a.groupBy("source").count()
      .agg(org.apache.spark.sql.functions.max("count")).as[Long].head()
    assert(maxPerSource <= 5L)
  }

  test("leakSafeSplit: a planted near-dup cluster lands whole in one " +
      "split, keyed by its min id") {
    import org.apache.spark.sql.functions._
    // 3 near-identical docs (ids 100,101,102) + distinct singletons
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      (100L, base), (101L, base + " mu"), (102L, base + " nu")) ++
      (0L until 30L).map(i =>
        (i, s"unique$i words ${i}x ${i}y ${i}z padder$i filler$i"))
    val df = rows.toDF("doc_id", "text")
    val got = Sampling.leakSafeSplit(df, "text", "doc_id", threshold = 0.5)
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().toSeq
    val cluster = got.filter(r => r._1 >= 100L)
    assert(cluster.size == 3)
    assert(cluster.map(_._2).toSet == Set(100L)) // min-id representative
    assert(cluster.map(_._3).toSet.size == 1) // one split for the cluster
    // singletons represent themselves
    got.filter(_._1 < 30L).foreach { case (id, rep, _) =>
      assert(rep == id, s"doc $id")
    }
    // exhaustive and disjoint by construction: one row per doc
    assert(got.map(_._1).sorted == rows.map(_._1).sorted)
  }

  test("leakSafeSplit is deterministic across partitionings and uses " +
      "the portable keep-hash boundaries") {
    import org.apache.spark.sql.functions._
    val a = Sampling.leakSafeSplit(docs, "text", "doc_id")
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().toMap2
    val b = Sampling.leakSafeSplit(docs.repartition(13), "text", "doc_id")
      .select("doc_id", "rep", "split")
      .as[(Long, Long, String)].collect().toMap2
    assert(a == b)
    // replay the hash boundary for a few docs
    a.foreach { case (id, (rep, split)) =>
      val h = ((rep % 1000003L) * (2654435761L % 1000003L)) % 1000003L
      val want = if (h < 100000L) "test" else if (h < 200000L) "val"
        else "train"
      assert(split == want, s"doc $id")
    }
  }

  test("leakSafeSplit stability law: non-bridging growth with fresh " +
      "larger ids never reassigns an existing doc; a bridging merge " +
      "re-keys the merged cluster whole") {
    import org.apache.spark.sql.functions._
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "red orange yellow green blue indigo violet umber sepia jet"
    val corpus0 = Seq(
      (100L, textA), (101L, textA + " mu"), (102L, textA + " nu"),
      (50L, textB), (51L, textB + " ochre")) ++
      (0L until 24L).map(i =>
        (i, s"unique$i words ${i}x ${i}y ${i}z padder$i filler$i"))
    def run(rows: Seq[(Long, String)]): Map[Long, (Long, String)] =
      Sampling.leakSafeSplit(rows.toDF("doc_id", "text"), "text",
          "doc_id", threshold = 0.5)
        .select("doc_id", "rep", "split")
        .as[(Long, Long, String)].collect().toMap2
    val before = run(corpus0)

    // stage 1 — non-bridging growth, all ids larger than any existing:
    // new singletons, a new cluster among themselves, and one new member
    // attaching to the textA component
    val grown = corpus0 ++
      (200L until 208L).map(i =>
        (i, s"fresh$i tokens ${i}p ${i}q ${i}r pad$i fill$i")) ++
      Seq((300L, "wholly new cluster of words one two three four five"),
        (301L, "wholly new cluster of words one two three four six"),
        (310L, textA + " xi")) // attaches to the {100,101,102} component
    val after = run(grown)
    before.foreach { case (id, repSplit) =>
      assert(after(id) == repSplit,
        s"doc $id reassigned by non-bridging growth: " +
          s"$repSplit -> ${after(id)}")
    }
    // the attaching member inherits the existing component's assignment
    assert(after(310L) == before(100L))
    // the new cluster keys by ITS min id
    assert(after(300L)._1 == 300L && after(301L)._1 == 300L)

    // stage 2 — a bridging doc merges two components. Similarity is
    // 3-token-shingle Jaccard, so the geometry is built by word
    // substitution in 20-word texts: tA and tB differ in 2 adjacent
    // middle words (J = 14/22 ≈ 0.64, SEPARATE at threshold 0.7); the
    // bridge tX takes one substituted word from each (J = 15/21 ≈ 0.71
    // to BOTH, pairing with both at 0.7). The merged cluster re-keys to
    // min id 50 and co-locates whole in 50's split — the documented
    // reassignment a merge forces.
    val w20 = (1 to 20).map(i => s"word$i")
    def mk(p10: String, p11: String): String =
      (w20.take(9) ++ Seq(p10, p11) ++ w20.drop(11)).mkString(" ")
    val tA = mk("alphax", "alphay")
    val tB = mk("betax", "betay")
    val tX = mk("betax", "alphay")
    val corpus2 = Seq(
      (100L, tA), (101L, tA + " mu"), (102L, tA + " nu"),
      (50L, tB), (51L, tB + " ochre")) ++
      (0L until 24L).map(i =>
        (i, s"unique$i words ${i}x ${i}y ${i}z padder$i filler$i"))
    def run07(rows: Seq[(Long, String)]): Map[Long, (Long, String)] =
      Sampling.leakSafeSplit(rows.toDF("doc_id", "text"), "text",
          "doc_id", threshold = 0.7)
        .select("doc_id", "rep", "split")
        .as[(Long, Long, String)].collect().toMap2
    val before2 = run07(corpus2)
    assert(before2(100L)._1 == 100L && before2(50L)._1 == 50L,
      "clusters must start separate at threshold 0.7")
    val merged = run07(corpus2 :+ (400L, tX))
    val cluster = Seq(50L, 51L, 100L, 101L, 102L, 400L)
    assert(cluster.map(id => merged(id)._1).toSet == Set(50L),
      s"merged cluster reps: ${cluster.map(id => merged(id))}")
    assert(cluster.map(id => merged(id)._2).toSet.size == 1,
      "merged cluster must land whole in one split")
    // the move is to the SURVIVING key's split: doc 100 now lives where
    // the 50-cluster lived
    assert(merged(100L)._2 == before2(50L)._2)
  }

  private implicit class Tup3Ops(xs: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] =
      xs.map { case (a, b, c) => (a, (b, c)) }.toMap
  }
}
