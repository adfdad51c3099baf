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
}
