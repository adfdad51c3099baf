package graft.operators

import org.apache.spark.sql.functions._

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

  test("encodeTokens with the learned merges reproduces the training " +
      "loop's final symbol state") {
    val docs = Seq(
      (1L, "low low low"),
      (2L, "lower lower"),
      (3L, "newest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val got = Bpe.encodeTokens(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 4's merge is (low, er), so lower -> [lower] whole;
    // low->[low], newest->[n,e,w,e,s,t]
    assert(got === Map("low" -> 3L, "lower" -> 2L, "e" -> 2L,
      "n" -> 1L, "w" -> 1L, "s" -> 1L, "t" -> 1L))
  }

  test("trainWithVocab's harvested histogram equals a separate encode " +
      "pass with the learned merges") {
    val docs = Seq(
      (1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainWithVocab(docs, "text",
      numMerges = 4, vocabTopK = 50)
    val separate = Bpe.encodeTokens(docs, "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(vocab.toSet === separate)
    assert(merges === Bpe.train(docs, "text", numMerges = 4))
  }

  test("the multi-merge encode kernel equals chained single applies") {
    import graft.functions.expr.BpeExprs
    val words = Seq("banana", "bandana", "ban", "a").toDF("w")
    val merges = Seq(("a", "n"), ("b", "an"), ("an", "a"))
    val viaKernel = words.select(col("w"),
      BpeExprs.bpeEncode(BpeExprs.codePointSymbols(col("w")), merges)
        .as("s"))
    val viaChain = words.select(col("w"),
      merges.foldLeft(BpeExprs.codePointSymbols(col("w"))) {
        case (c, (l, r)) => BpeExprs.bpeApply(c, l, r)
      }.as("s"))
    val a = viaKernel.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1)).toMap
    val b = viaChain.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a === b)
    assert(a("banana") === Seq("ban", "ana"))
    assert(a("a") === Seq("a"))
  }

  test("the training loop releases every persisted frame") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    Bpe.train(docs, "text", numMerges = 3)
    assert(spark.sparkContext.getPersistentRDDs.keySet === before)
  }
}
