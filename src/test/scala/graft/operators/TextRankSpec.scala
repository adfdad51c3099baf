package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, query {"cat", "dog"}: doc 1 is cat-heavy and short, doc 2
  // mentions both once, doc 3 is long with one cat, doc 4 has neither
  private val corpus = Seq(
    (1L, "cat cat cat toy"),
    (2L, "cat dog walk"),
    (3L, "one two three four five six seven cat nine ten"),
    (4L, "nothing relevant here")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi formula") {
    val got = TextRank.bm25(corpus, "text", "doc_id", Array("cat", "dog"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    // N=4, avgdl=(4+3+10+3)/4=5.0; df(cat)=3, df(dog)=1
    val n = 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, idf0: Double) =
      idf0 * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 5.0))
    val expect = Map(
      1L -> w(3, 4, idf(3)),
      2L -> (w(1, 3, idf(3)) + w(1, 3, idf(1))),
      3L -> w(1, 10, idf(3)))
    assert(got.keySet == expect.keySet) // doc 4 has no hits -> absent
    expect.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-12, s"doc $id: ${got(id)} vs $s")
    }
    // relevance sanity: the rare term (dog, df=1) outweighs repetition of
    // the common one, and more/shorter hits outrank the long straggler
    assert(got(2L) > got(1L) && got(1L) > got(3L))
  }

  test("bm25 accepts a pre-tokenized column") {
    val pretok = corpus.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("text"))
    val a = TextRank.bm25(corpus, "text", "doc_id", Array("cat", "dog"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    val b = TextRank.bm25(pretok, "text", "doc_id", Array("cat", "dog"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("bm25 scoring pass is one exchange-free projection over the corpus") {
    // file-backed frame: a local Seq relation would constant-fold to a
    // LocalTableScan at optimize time and hide the plan under test
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = TextRank.bm25(docs, "text", "doc_id", Array("cat", "dog"))
    val p = df.queryExecution.executedPlan.toString
    // the stats pass already ran (bounded collect at construction); the
    // returned frame must score row-locally: no join, no exchange
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("term_counts"), p.take(3000))
  }

  test("term_counts aligns with its term list and counts duplicates") {
    val got = corpus.select(graft.functions.expr.TextHashExprs.termCounts(
      graft.functions.TextFunctions.tokens(col("text")),
      Array("cat", "toy", "absent")).as("tc"))
      .orderBy(lit(1)) // stable single-partition order not needed; collect all
      .as[Seq[Long]].collect().toSet
    assert(got == Set(Seq(3L, 1L, 0L), Seq(1L, 0L, 0L), Seq(0L, 0L, 0L)))
  }
}
