package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("bucketOf matches a driver-side replay of the codepoint fold") {
    def ref(tok: String, buckets: Int): Int = {
      var h = 0L
      tok.foreach(c => h = (h * 31 + c.toLong) % Dsir.HashMod)
      (h % buckets).toInt
    }
    val toks = Seq("a", "z", "hello", "the", "antidisestablishmentarianism")
    val got = toks.toDF("t")
      .select(Dsir.bucketOf(col("t"), 4096).as("b"))
      .as[Int].collect().toSeq
    assert(got == toks.map(ref(_, 4096)))
  }

  test("featureBuckets keeps only ascii-alpha tokens, case-folded, as a bag") {
    val df = Seq((1L, "The the THE cat, 42 naïve beta beta")).toDF("id", "text")
    val b = df.select(
        Dsir.featureBuckets(df, "text", 4096, maxNgram = 1).as("bks"))
      .as[Seq[Int]].head()
    // "the" x3 (case-folded), "beta" x2; "cat," has punctuation, "42" is
    // numeric, "naïve" is non-ascii — all dropped
    assert(b.size == 5)
    assert(b.distinct.size == 2)
  }

  test("bigram features pair SURVIVING tokens via the same fold hash") {
    def ref(tok: String, buckets: Int): Int = {
      var h = 0L
      tok.foreach(c => h = (h * 31 + c.toLong) % Dsir.HashMod)
      (h % buckets).toInt
    }
    // "cat, 42" noise sits between alpha tokens: the bigram pairs the
    // FILTERED neighbours (the·beta), not the raw ones
    val df = Seq((1L, "The cat, 42 beta beta")).toDF("id", "text")
    val b = df.select(Dsir.featureBuckets(df, "text", 4096).as("bks"))
      .as[Seq[Int]].head()
    val uni = Seq("the", "beta", "beta").map(ref(_, 4096))
    val bi = Seq("the beta", "beta beta").map(ref(_, 4096))
    assert(b == uni ++ bi)
    // degenerate docs: singleton -> unigram only; empty -> no features
    val one = Seq((1L, "word")).toDF("id", "text")
    assert(one.select(Dsir.featureBuckets(one, "text", 4096).as("b"))
      .as[Seq[Int]].head() == Seq(ref("word", 4096)))
    val none = Seq((1L, "42 7,")).toDF("id", "text")
    assert(none.select(Dsir.featureBuckets(none, "text", 4096).as("b"))
      .as[Seq[Int]].head().isEmpty)
  }

  test("bigram model separates word order the unigram model cannot") {
    // target and pool share the SAME unigram bag — only adjacency differs
    val target = (0 until 20).map(i => (i.toLong, "t", "new york city"))
    val pool = (20 until 60).map(i => (i.toLong, "p", "city york new"))
    val candT = (60 until 63).map(i => (i.toLong, "c", "new york"))
    val candP = (63 until 66).map(i => (i.toLong, "c", "york new"))
    val df = (target ++ pool ++ candT ++ candP).toDF("doc_id", "grp", "text")
    val uni = Dsir.importanceWeights(df, "text", "doc_id",
        col("grp") === "t", numBuckets = 64, maxNgram = 1)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    // unigram-blind: both candidate shapes carry identical bags
    assert(uni(60L) == uni(63L))
    val bi = Dsir.importanceWeights(df, "text", "doc_id",
        col("grp") === "t", numBuckets = 64, maxNgram = 2)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    candT.foreach { case (id, _, _) =>
      assert(bi(id) > bi(63L), s"target-ordered cand $id") }
    assert(bi(60L) > 0 && bi(63L) < 0)
  }

  test("importanceWeights separates a planted target-like slice") {
    // target docs speak vocabulary A, raw pool speaks vocabulary B;
    // held-out candidates in vocabulary A must score positive, B negative
    val target = (0 until 20).map(i => (i.toLong, "t", "alpha beta gamma delta"))
    val pool = (20 until 60).map(i => (i.toLong, "p", "omega sigma kappa zeta"))
    val candA = (60 until 65).map(i => (i.toLong, "c", "alpha beta gamma"))
    val candB = (65 until 70).map(i => (i.toLong, "c", "omega sigma kappa"))
    val df = (target ++ pool ++ candA ++ candB).toDF("doc_id", "grp", "text")
    // few buckets relative to the tiny corpus: with B >> corpus tokens the
    // add-one smoothing flattens both models and the ratio washes out
    // (the 8-word vocabulary is collision-free at B=64 under this hash;
    // unigram-only so that claim stays checkable by inspection)
    val w = Dsir.importanceWeights(df, "text", "doc_id",
        isTarget = col("grp") === "t", numBuckets = 64, maxNgram = 1)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    candA.foreach { case (id, _, _) => assert(w(id) > 0, s"cand $id") }
    candB.foreach { case (id, _, _) => assert(w(id) < 0, s"cand $id") }
  }

  test("importanceWeights is partition-invariant (deterministic at scale)") {
    val a = Dsir.importanceWeights(docs, "text", "doc_id",
      col("lang") === "en", numBuckets = 512)
    val b = Dsir.importanceWeights(docs.repartition(23), "text", "doc_id",
      col("lang") === "en", numBuckets = 512)
    val am = a.select("doc_id", "logw").as[(Long, Double)].collect().toMap
    val bm = b.select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(am == bm)
  }

  test("importanceWeights matches a driver-side brute-force replica") {
    val b = 256
    val rows = docs.filter(col("doc_id") < 60)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    def feats(text: String): Seq[Int] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
        .filter(t => t.nonEmpty && t.forall(c => c >= 'a' && c <= 'z'))
      def bk(t: String): Int = {
        var h = 0L
        t.foreach(c => h = (h * 31 + c.toLong) % Dsir.HashMod)
        (h % b).toInt
      }
      // default model: unigrams then space-joined bigrams, same fold
      toks.map(bk) ++ toks.sliding(2).filter(_.size == 2)
        .map(p => bk(p.mkString(" "))).toSeq
    }
    val all = rows.flatMap { case (id, _, t) => feats(t) }
    val tgt = rows.filter(_._2 == "en").flatMap { case (_, _, t) => feats(t) }
    val cr = all.groupBy(identity).view.mapValues(_.size).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.size).toMap
    val (nr, nt) = (all.size.toDouble, tgt.size.toDouble)
    def lr(bk: Int): Double =
      math.log((ct.getOrElse(bk, 0) + 1.0) / (nt + b)) -
        math.log((cr.getOrElse(bk, 0) + 1.0) / (nr + b))
    val sub = docs.filter(col("doc_id") < 60)
    val got = Dsir.importanceWeights(sub, "text", "doc_id",
        col("lang") === "en", numBuckets = b)
      .select("doc_id", "n_feats", "logw")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => (id, (n, w)) }.toMap
    rows.foreach { case (id, _, t) =>
      val f = feats(t)
      if (f.nonEmpty) {
        val (n, w) = got(id)
        assert(n == f.size.toLong, s"doc $id n_feats")
        // engine rounds half-even at 6dp; allow one ulp-of-round slack
        assert(math.abs(w - f.map(lr).sum) < 2e-6, s"doc $id logw")
      } else assert(!got.contains(id), s"doc $id should have no features")
    }
  }
}
