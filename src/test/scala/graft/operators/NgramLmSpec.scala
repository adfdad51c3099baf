package graft.operators

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM: exact smoothed log-probs on a hand-computable corpus") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c d"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    // counts over mapped tokens (all in vocab):
    //   B(a,b)=3, B(b,a)=1, B(b,c)=1, B(c,d)=1; U(a)=3, U(b)=2, U(c)=1
    //   P = (B+1) / (U + 4097)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6((math.log(4.0 / 4100) + math.log(2.0 / 4099) +
      math.log(4.0 / 4100)) / 3)
    val d2 = r6((math.log(4.0 / 4100) + math.log(2.0 / 4099) +
      math.log(2.0 / 4098)) / 3)
    assert(got(0) == ((1L, 3L, Some(d1))))
    assert(got(1) == ((2L, 3L, Some(d2))))
    assert(got(2) == ((3L, 0L, None))) // single token: no bigrams
    // the doc made of the corpus's most frequent bigram scores higher
    assert(d1 > d2)
  }

  test("rare-vocab tokens map to <unk> and share its statistics") {
    // vocabSize 2 keeps only the two most frequent tokens; the rest
    // collapse to <unk>, so the two rare-tailed docs score identically
    val docs = Seq(
      (1L, "x x y zebra"),
      (2L, "x x y quokka"),
      (3L, "x y")
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(docs, "text", "doc_id", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got(0)._3 == got(1)._3, "unk-mapped docs must score equally")
    assert(got(0)._2 == 3L && got(2)._2 == 1L)
  }

  test("Kneser-Ney: exact interpolated-discount probabilities on a " +
      "hand-computable corpus") {
    // one doc "a b a b a c": B(a,b)=2 B(b,a)=2 B(a,c)=1; U(a)=3 U(b)=2;
    // fan-out f(a)=2 f(b)=1; contexts p(a)=p(b)=p(c)=1; T=3 types
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val row = NgramLm.scoreDocsKneserNey(docs, "text", "doc_id")
      .collect()(0)
    def pkn(b: Double, u: Double, f: Double, p: Double): Double =
      math.max(b - 0.75, 0.0) / u + 0.75 * f / u * (p / 3.0)
    val pAB = pkn(2, 3, 2, 1) // 0.5833...
    val pBA = pkn(2, 2, 1, 1) // 0.75
    val pAC = pkn(1, 3, 2, 1) // 0.25
    val expect = BigDecimal(
      (2 * math.log(pAB) + 2 * math.log(pBA) + math.log(pAC)) / 5.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(1) === 5L)
    assert(row.getDouble(2) === expect)
  }

  test("Kneser-Ney continuation mass demotes frequent-but-predictable " +
      "tokens (the san-francisco effect)") {
    // 'b' and 'c' are equally frequent as SECOND tokens, but 'c' follows
    // only one context while 'b' follows three — P_cont(b) > P_cont(c),
    // so after an unseen-ish prefix the model prefers 'b'. Compare the
    // continuation parts via two single-bigram docs sharing a prefix.
    val docs = Seq(
      (1L, "x b"), (2L, "y b"), (3L, "z b"),
      (4L, "w c"), (5L, "w c"), (6L, "w c"))
      .toDF("doc_id", "text")
    val got = NgramLm.scoreDocsKneserNey(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc1: B(x,b)=1 U(x)=1 f(x)=1 p(b)=3 T=4 ->
    //   0.25/1 + 0.75*1*(3/4) = 0.8125
    assert(got(0).getDouble(2) ===
      BigDecimal(math.log(0.25 + 0.75 * 3.0 / 4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc4: B(w,c)=3 U(w)=3 f(w)=1 p(c)=1 T=4 ->
    //   2.25/3 + 0.75*(1/3)*(1/4) = 0.8125 as well — but via the
    //   DISCOUNTED count, not continuation: same value, different path
    assert(got(3).getDouble(2) ===
      BigDecimal(math.log(2.25 / 3.0 + 0.75 / 3.0 * (1.0 / 4.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("collocations: PMI from exact counts, minCount suppresses the " +
      "hapax tail, total-ordered top-k") {
    // "new york" appears 3x; "the the" 4x but from a frequent token;
    // "rare gem" once (suppressed by minCount=2)
    val docs = Seq(
      (1L, "new york new york the the the the"),
      (2L, "new york the the the the rare gem"))
      .toDF("doc_id", "text")
    val got = NgramLm.collocations(docs, "text", "doc_id", minCount = 2L,
      topK = 10).collect()
    val asMap = got.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getDouble(3)))).toMap
    // counts: tokens N=16; new=3, york=3, the=8; pairs: (new,york)=3,
    // (york,new)=1(<2), (the,the)=6, (york,the)=2, (the,rare)... =1
    assert(!asMap.contains(("rare", "gem")))
    val (nNY, pmiNY) = asMap(("new", "york"))
    assert(nNY === 3L)
    assert(pmiNY === BigDecimal(math.log(3.0 * 16.0 / (3.0 * 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val (nTT, pmiTT) = asMap(("the", "the"))
    assert(nTT === 6L)
    assert(pmiTT === BigDecimal(math.log(6.0 * 16.0 / (8.0 * 8.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // PMI ranks the true collocation above the frequent filler pair
    assert(pmiNY > pmiTT)
    assert(got.head.getString(0) === "new" && got.head.getString(1) === "york")
  }
}
