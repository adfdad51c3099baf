package graft.operators

import graft.SparkSpec

/** [[Bpe]] — greedy BPE tokenizer training. The Sennrich toy corpus
  * shape (low/lower/newest) is small enough to hand-run all rounds,
  * including two count ties that pin the (count DESC, left ASC,
  * right ASC) total order.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge table matches the hand-run greedy rounds, ties broken " +
      "by symbol order") {
    val docs = Seq(
      (1L, "low low low"),
      (2L, "lower lower"),
      (3L, "newest")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", numMerges = 4)
    // round 1: (l,o)=5 ties (o,w)=5 -> "l" < "o" wins
    // round 2: (lo,w)=5
    // round 3: lower is [low,e,r]: (low,e)=2 ties (e,r)=2 -> "e" < "low"
    // round 4: (low,er)=2
    assert(got === Seq(
      Bpe.Merge(1, "l", "o", 5L),
      Bpe.Merge(2, "lo", "w", 5L),
      Bpe.Merge(3, "e", "r", 2L),
      Bpe.Merge(4, "low", "er", 2L)))
  }

  test("merge application is leftmost-non-overlapping (aaa -> [aa, a])") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", numMerges = 2)
    // "aaa" has TWO overlapping (a,a) positions but only ONE merges
    assert(got === Seq(
      Bpe.Merge(1, "a", "a", 2L),
      Bpe.Merge(2, "aa", "a", 1L)))
  }

  test("training stops early when no adjacent pair remains") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", numMerges = 5) === Seq.empty)
  }

  test("word frequency weights the counts (not document frequency)") {
    // one doc, repeated word: pair counts must scale with occurrences
    val docs = Seq((1L, "go go go stop")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", numMerges = 1)
    assert(got.head === Bpe.Merge(1, "g", "o", 3L))
  }

  test("the training loop releases every persisted frame") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    Bpe.train(docs, "text", numMerges = 3)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
  }
}
