package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("chunking tiles tokens with the requested overlap, tail kept") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextPipeline.chunkByTokens(df, "text", "doc_id",
      chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect()
    // 10 tokens, stride 3: starts 1,4,7 -> 3 windows; consecutive windows
    // share exactly one token; the last window ends at the last token
    assert(got.filter(_._1 == 1L).map(_._4).toSeq ==
      Seq("a b c d", "d e f g", "g h i j"))
    // short doc: one window, whole doc
    assert(got.filter(_._1 == 2L).map(_._4).toSeq == Seq("x y z"))
    // every original token appears in some window
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == "a b c d e f g h i j".split(" ").toSet)
  }

  test("chunk boundaries: n == chunkSize yields one window") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TextPipeline.chunkByTokens(df, "text", "doc_id", 4, 2)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == 1 && got.head._4 == "a b c d")
  }

  test("chunkCount law: sum over docs equals chunkByTokens row count") {
    // token counts chosen to hit every branch of the window-count
    // expression: empty doc, below / exactly at / one over chunkSize,
    // an exact stride multiple, one past it, and a long tail
    val docs = Seq(0, 1, 3, 4, 5, 7, 10, 11, 12, 13, 25).zipWithIndex
      .map { case (n, i) =>
        (i.toLong, (1 to n).map(k => s"t$k").mkString(" ")) }
      .toDF("doc_id", "text")
    for ((cs, ov) <- Seq((4, 1), (4, 2), (4, 0), (6, 3))) {
      val exploded =
        TextPipeline.chunkByTokens(docs, "text", "doc_id", cs, ov).count()
      val summed = docs
        .agg(sum(TextPipeline.chunkCount(
          size(graft.functions.TextFunctions.tokens($"text")), cs, ov)))
        .head().getLong(0)
      assert(summed == exploded,
        s"chunkCount diverged from chunkByTokens at ($cs, $ov)")
    }
  }

  test("decontamination flags benchmark members, copies, and nothing else") {
    val corpus = Seq(
      (0L, "one two three four five six"), // benchmark member
      (1L, "one two three four five six"), // exact copy -> contaminated
      (2L, "totally different words here now"), // clean
      (3L, "four three two one six five") // same vocab, no shared 4-gram
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 0L)
    val got = TextPipeline.flagContaminated(corpus, bench, "text", "doc_id",
      n = 4, minHits = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    assert(got.map(_._3).toSeq == Seq(true, true, false, false))
    // the copy shares ALL 3 distinct 4-grams of the benchmark doc
    assert(got(1)._2 == 3L)
  }

  test("decontamination set-probe and join fallback agree exactly") {
    val corpus = Seq(
      (0L, "one two three four five six seven"),
      (1L, "zero one two three four five six seven eight"), // 4 shared 4-grams
      (2L, "totally different words here now indeed"),
      (3L, "six seven eight nine ten"), // 1 shared 4-gram w/ doc 1? no: bench is doc 0
      (4L, "three four five six seven and more") // shared interior 4-grams
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 0L)
    val fast = TextPipeline.flagContaminated(corpus, bench, "text", "doc_id",
      n = 4).orderBy("doc_id").collect().toSeq
    val slow = TextPipeline.flagContaminated(corpus, bench, "text", "doc_id",
      n = 4, maxSetNgrams = 1).orderBy("doc_id").collect().toSeq
    assert(fast == slow)
    assert(fast.exists(_.getBoolean(2)) && fast.exists(!_.getBoolean(2)))
  }

  test("short-doc fallback: sub-n benchmark docs still catch exact copies") {
    val corpus = Seq((0L, "tiny doc"), (1L, "tiny doc"), (2L, "other text"))
      .toDF("doc_id", "text")
    val got = TextPipeline.flagContaminated(corpus,
      corpus.filter($"doc_id" === 0L), "text", "doc_id", n = 13)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect()
    assert(got.map(_._3).toSeq == Seq(true, true, false))
  }

  test("duplicated spans: canonical copy survives, later occurrences strip") {
    val common = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"first document begins $common and then ends"),
      (2L, s"unrelated preamble here $common trailing words follow"),
      (3L, "no duplicated content in this document at all"),
      // in-document repetition: the same 5-token run twice
      (4L, "p q r s t p q r s t closing remark")
    ).toDF("doc_id", "text")
    val stats = TextPipeline.duplicatedSpanStats(docs, "text", "doc_id",
      k = 5)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1 holds the canonical run: nothing dropped; doc 2 loses the
    // 6 shared tokens (two duplicated 5-windows, union of spans); doc 4
    // loses its second 5-token repetition
    assert(stats == Seq((1L, 12L, 0L, 12L), (2L, 12L, 6L, 6L),
      (3L, 8L, 0L, 8L), (4L, 12L, 5L, 7L)))
    val cleaned = TextPipeline.dropDuplicatedSpans(docs, "text", "doc_id",
      k = 5)
      .orderBy("doc_id").as[(Long, String)].collect().toMap
    assert(cleaned(2L) == "unrelated preamble here trailing words follow")
    assert(cleaned(4L) == "p q r s t closing remark")
    assert(cleaned(1L).contains(common)) // canonical copy intact
    assert(cleaned(3L) == "no duplicated content in this document at all")
  }

  test("mega-duplicate hot window: one window repeated across 10^4 docs " +
      "marks all non-canonical copies without a rank window") {
    // every doc shares the SAME 5-token window at position 1; only the
    // trailing token differs. Pre-fix this was a single-task sort over all
    // 10^4 occurrences of the hot hash; the aggregate-min path must give
    // the identical answer (canonical = lowest doc_id, everything else
    // drops its 5 shared tokens).
    val n = 10000
    val docs = spark.range(n)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon u', id) AS text")
    val stats = TextPipeline.duplicatedSpanStats(docs, "text", "doc_id",
      k = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.length == n)
    stats.foreach { case (id, nt, nd, nk) =>
      assert(nt == 6L)
      if (id == 0L) assert(nd == 0L && nk == 6L, s"canonical doc $id")
      else assert(nd == 5L && nk == 1L, s"doc $id")
    }
  }

  test("mega-duplicate within one doc: periodic text keeps one period") {
    // one doc = a 5-token run repeated 1000x: every window at pos >= 6
    // duplicates one of the 5 canonical phase windows, so exactly the
    // first period survives
    val period = "a b c d e "
    val docs = Seq((1L, (period * 1000).trim)).toDF("doc_id", "text")
    val stats = TextPipeline.duplicatedSpanStats(docs, "text", "doc_id",
      k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats == Seq((1L, 5000L, 4995L, 5L)))
    val cleaned = TextPipeline.dropDuplicatedSpans(docs, "text", "doc_id",
      k = 5)
      .as[(Long, String)].collect().head
    assert(cleaned._2 == "a b c d e")
  }

  test("packIterator is lazy: emitting one bin pulls at most one bin + 1 " +
      "from the source") {
    import org.apache.spark.sql.Row
    var pulled = 0
    val source = Iterator.tabulate(1000) { i =>
      pulled += 1
      Row(i.toLong, 10L)
    }
    val out = TextPipeline.packIterator(source, nIdx = 1, capacity = 64L,
      pid = 0L)
    // first bin holds 6 chunks of 10 tokens; materializing it may pull the
    // 7th row (the overflow row that opens bin 1) but nothing beyond
    val first = out.take(6).toList
    assert(first.map(_.getLong(2)).distinct == List(0L))
    assert(first.forall(_.getLong(3) == 60L))
    assert(pulled <= 7, s"pulled $pulled rows for one 6-row bin")
    // and draining the rest loses nothing
    assert(out.size == 994)
  }

  test("sequence packing: bins respect capacity, oversize isolates, " +
      "no chunk lost") {
    val chunks = spark.range(100).selectExpr("id",
      "CAST(10 + id % 23 AS BIGINT) AS n_tokens")
    val packed = TextPipeline.packChunks(chunks, "n_tokens", "id", 64L)
    // nothing lost or duplicated
    assert(packed.count() == 100)
    assert(packed.select("id").distinct().count() == 100)
    // every bin's fill respects capacity, and bin_fill = sum of members
    val bins = packed.groupBy("bin_id")
      .agg(sum($"n_tokens").as("tot"), first($"bin_fill").as("fill"),
        countDistinct($"bin_fill").as("nf"))
      .as[(Long, Long, Long, Long)].collect()
    bins.foreach { case (b, tot, fill, nf) =>
      assert(tot == fill && nf == 1, s"bin $b fill mismatch")
      assert(tot <= 64L, s"bin $b over capacity: $tot")
    }
    // next-fit waste bound: every bin except possibly the last per
    // partition is > capacity - max_chunk (else the next chunk fit)
    val nParts = chunks.repartitionByRange($"id").rdd.getNumPartitions
    val under = bins.count(_._2 <= 64L - 32L)
    assert(under <= nParts, s"$under underfull bins for $nParts partitions")
    // an oversize chunk gets its own bin rather than failing
    val big = Seq((1L, 10L), (2L, 500L), (3L, 10L)).toDF("id", "n_tokens")
    val pb = TextPipeline.packChunks(big, "n_tokens", "id", 64L)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    assert(pb(2L) != pb(1L) && pb(2L) != pb(3L))
  }

  test("PII redaction is idempotent: redacting redacted text is a no-op") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .select(concat($"text", lit(" mail a.b@c.io tel 415-555-0100 "),
        lit("ip 10.1.2.3")).as("text"))
    val once = docs.select(TextPipeline.redactPii($"text").as("r"))
    val twice = once.select(TextPipeline.redactPii($"r").as("r"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
  }

  test("PII redaction replaces emails, phones, IPs; prose untouched") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "call 415-555-0142 or visit 192.168.0.1 now",
      "version 1.2 costs 10.50 dollars, room 101").toDF("text")
    val got = df.select(TextPipeline.redactPii($"text")).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> or visit <IP> now")
    // decimals and small numbers are NOT dotted-quads or phones
    assert(got(2) == "version 1.2 costs 10.50 dollars, room 101")
  }
}
