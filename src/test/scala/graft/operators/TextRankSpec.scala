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

  test("bm25 scoring pass is join-free; undersplit input pays only the " +
      "widen exchange") {
    // file-backed frame: a local Seq relation would constant-fold to a
    // LocalTableScan at optimize time and hide the plan under test. The
    // sf0.001 fixture is one parquet split, so Tables.widenForKernel
    // deliberately injects ONE REPARTITION_BY_NUM exchange — that widen is
    // the only exchange the plan may contain, and there is never a join.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = TextRank.bm25(docs, "text", "doc_id", Array("cat", "dog"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("term_counts"), p.take(3000))
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.forall(_.contains("REPARTITION_BY_NUM")),
      exchangeLines.mkString("\n"))
  }

  test("bm25 on a multi-split scan is exchange-free (the production-scale " +
      "plan)") {
    // the real claim behind widenForKernel being a no-op at 100 TB: force
    // the same fixture to plan >= defaultParallelism splits and the widen
    // must not fire — scoring is one row-local projection, zero exchanges
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "2048")
      conf.set("spark.sql.files.openCostInBytes", "0")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      assert(docs.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism)
      val df = TextRank.bm25(docs, "text", "doc_id", Array("cat", "dog"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(3000))
      assert(!p.contains("Join"), p.take(3000))
      assert(p.contains("term_counts"), p.take(3000))
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }

  test("term_counts aligns with its term list and counts duplicates") {
    val got = corpus.select(graft.functions.expr.TextHashExprs.termCounts(
      graft.functions.TextFunctions.tokens(col("text")),
      Array("cat", "toy", "absent")).as("tc"))
      .orderBy(lit(1)) // stable single-partition order not needed; collect all
      .as[Seq[Long]].collect().toSet
    assert(got == Set(Seq(3L, 1L, 0L), Seq(1L, 0L, 0L), Seq(0L, 0L, 0L)))
  }

  test("shingleCosinePairs matches the hand-computed tf cosine") {
    // doc1 3-shingle tf: {abc:2, bca:1, cab:1}; doc2: {abc:3, bca:2,
    // cab:2}; doc3 disjoint. dot(1,2)=2*3+1*2+1*2=10, |1|²=6, |2|²=17
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c a b c a b c"),
      (3L, "x y z w")).toDF("doc_id", "text")
    val rows = TextRank.shingleCosinePairs(docs, "text", "doc_id",
      shingleK = 3, maxDf = 100, minSim = 0.5).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("dot") == 10L)
    assert(r.getAs[Double]("cosine") == 10.0 / math.sqrt(6.0 * 17.0))
  }

  test("tfidfKeywords matches the hand-computed smoothed tf-idf with " +
      "term tiebreak") {
    // N=3; df: apple 2, banana/cherry/durian 1
    // idf = ln((N+1)/(df+1)): apple ln(4/3), others ln(2)
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val got = TextRank.tfidfKeywords(docs, "text", "doc_id", k = 5)
      .orderBy("doc_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .toSeq
    val ln43x2 = BigDecimal(2.0 * math.log(4.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // 0.5754
    val ln43 = BigDecimal(math.log(4.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // 0.2877
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble // 0.6931
    assert(got === Seq(
      (1L, "banana", 1L, 1L, ln2, 1L),
      (1L, "apple", 2L, 2L, ln43x2, 2L),
      (2L, "cherry", 1L, 1L, ln2, 1L),
      (2L, "apple", 1L, 2L, ln43, 2L),
      (3L, "durian", 1L, 1L, ln2, 1L)))
  }

  test("tfidfKeywords: k truncates per document; equal scores break " +
      "ties on the term string") {
    // both terms appear once in the one doc and once corpus-wide: equal
    // score, so rank order must be alphabetical
    val docs = Seq((1L, "zebra aardvark")).toDF("doc_id", "text")
    val top1 = TextRank.tfidfKeywords(docs, "text", "doc_id", k = 1)
      .collect()
    assert(top1.length == 1)
    assert(top1(0).getAs[String]("term") == "aardvark")
  }

  test("shingleCosinePairs: maxDf drops ubiquitous shingles before the " +
      "pair join") {
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c a b c a b c")).toDF("doc_id", "text")
    // every shared shingle has df=2 > maxDf=1 -> no posting survives the
    // cap -> no pair, regardless of how similar the documents are
    assert(TextRank.shingleCosinePairs(docs, "text", "doc_id",
      shingleK = 3, maxDf = 1, minSim = 0.0).count() == 0L)
  }
}
