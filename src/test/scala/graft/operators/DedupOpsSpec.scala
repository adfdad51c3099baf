package graft.operators

import graft.SparkSpec

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // a small corpus with exact dupes, near-dupes, and distinct docs
  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDup = base.replace("today", "tonight")
  private val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, nearDup), // near dup of 0 (1 token changed)
    (3L, "completely different content about spark query engines and scale"),
    (4L, "  The   quick brown fox jumps over the lazy dog near the river bank today  ") // normalized dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical text") {
    val ids = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 2L, 3L, 4L))
  }

  test("normalized dedup also removes case/whitespace variants") {
    val ids = Dedup.normalized(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 2L, 3L))
  }

  test("shingleHashes produces k-gram sets") {
    val n = docs.filter($"doc_id" === 0)
      .select(org.apache.spark.sql.functions.size(
        Dedup.shingleHashes($"text", 3)).as("n")).head().getInt(0)
    // 14 tokens -> 12 trigrams, "the quick/lazy/river" distinct -> 12 unique
    assert(n == 12)
  }

  test("prefixFilterPairs: FULL RECALL — equals the brute-force exact " +
      "set-Jaccard join at several thresholds (the guarantee the LSH " +
      "candidate path trades away)") {
    import org.apache.spark.sql.functions._
    // a richer corpus: exact dup, near dups at graded distances, and
    // docs sharing only common shingles (prefix filter must still pair
    // qualifying ones through rare-shingle prefixes)
    val corpus = (docs.as[(Long, String)].collect().toSeq ++ Seq(
      (5L, base.replace("quick", "swift").replace("lazy", "idle")),
      (6L, base + " and then some extra trailing words here"),
      (7L, nearDup.replace("river", "creek"))))
      .toDF("doc_id", "text")
    def brute(t: Double) = {
      val sets = corpus.select(col("doc_id"),
        array_distinct(Dedup.shingles(col("text"), 3)).as("s"))
      val a = sets.select(col("doc_id").as("id_a"), col("s").as("sa"))
      val b = sets.select(col("doc_id").as("id_b"), col("s").as("sb"))
      a.crossJoin(b).where(col("id_a") < col("id_b"))
        .withColumn("i",
          size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .withColumn("jaccard", col("i") /
          (size(col("sa")) + size(col("sb")) - col("i")))
        .where(col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    }
    // 0.56 and 0.55 are ceil-overshoot thresholds (0.56*25 =
    // 14.000000000000002): without the epsilon-guarded bounds the
    // length filter drops boundary pairs (the review's counterexample)
    for (t <- Seq(0.3, 0.5, 0.55, 0.56, 0.7, 0.9)) {
      val got = Dedup.prefixFilterPairs(corpus, "text", "doc_id", t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == brute(t), s"threshold $t")
      if (t <= 0.5) assert(got.nonEmpty, s"threshold $t found nothing")
    }
  }

  test("prefixFilterJoin (cross-corpus R-S form): FULL RECALL — equals " +
      "the brute-force exact cross Jaccard join at several thresholds, " +
      "id collisions across corpora included") {
    import org.apache.spark.sql.functions._
    val leftC = (docs.as[(Long, String)].collect().toSeq ++ Seq(
      (5L, base.replace("quick", "swift").replace("lazy", "idle")),
      (6L, base + " and then some extra trailing words here")))
      .toDF("doc_id", "text")
    // right corpus REUSES ids 0/1 (distinct corpora may collide) and
    // carries exact, near, and unrelated members
    val rightC = Seq((0L, base), (1L, nearDup.replace("river", "creek")),
      (9L, "completely unrelated words in this reference document text"))
      .toDF("doc_id", "text")
    def brute(t: Double) = {
      def sets(df: org.apache.spark.sql.DataFrame, id: String, s: String) =
        df.select(col("doc_id").as(id),
          array_distinct(Dedup.shingles(col("text"), 3)).as(s))
      sets(leftC, "id_l", "sl").crossJoin(sets(rightC, "id_r", "sr"))
        .withColumn("i",
          size(array_intersect(col("sl"), col("sr"))).cast("double"))
        .withColumn("jaccard", col("i") /
          (size(col("sl")) + size(col("sr")) - col("i")))
        .where(col("jaccard") >= t)
        .select("id_l", "id_r", "jaccard")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    }
    for (t <- Seq(0.3, 0.5, 0.56, 0.7, 0.9)) {
      val got = Dedup.prefixFilterJoin(leftC, rightC, "text", "doc_id", t)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(got == brute(t), s"threshold $t")
      if (t <= 0.7) assert(got.nonEmpty, s"threshold $t found nothing")
    }
    // keyed joins only
    val p = Dedup.prefixFilterJoin(leftC, rightC, "text", "doc_id", 0.7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("prefixFilterPairs recall at a ceil-overshoot boundary: a " +
      "14-of-25 subset pair at t=0.56 (J exactly 0.56) must be found") {
    import org.apache.spark.sql.functions._
    // doc A: 26 tokens -> 24 trigram shingles... construct directly at
    // the shingle-count level: A has 27 tokens (25 shingles), B is a
    // prefix of A with 16 tokens (14 shingles, all shared with A)
    val aTokens = (1 to 27).map(i => s"tok$i").mkString(" ")
    val bTokens = (1 to 16).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, aTokens), (2L, bTokens)).toDF("doc_id", "text")
    // sanity: set sizes 25 and 14, intersection 14 -> J = 14/25 = 0.56
    val sizes = corpus.select(
      size(array_distinct(Dedup.shingles(col("text"), 3)))).as[Int]
      .collect().toSeq
    assert(sizes == Seq(25, 14), sizes)
    val got = Dedup.prefixFilterPairs(corpus, "text", "doc_id", 0.56)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.56)), got)
  }

  test("prefixFilterPairs plans with keyed joins only — no cartesian, " +
      "no nested loop") {
    val p = Dedup.prefixFilterPairs(docs, "text", "doc_id", 0.7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("ngram jaccard: identical=1, near-dup high, distinct low") {
    val df = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.ngramJaccard($"a.text", $"b.text", 3).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(df((0L, 1L)) == 1.0)
    assert(df((0L, 2L)) > 0.5 && df((0L, 2L)) < 1.0)
    assert(df((0L, 3L)) == 0.0)
  }

  test("minhash candidates find the near-dup pair and skip distinct docs") {
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // exact dup always caught
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // distinct doc
  }

  test("df-banned boilerplate shingles stop false candidates") {
    val boiler = "copyright acme corp all rights reserved published under license"
    val docs = Seq(
      (0L, s"$boiler the quick brown fox jumps over the lazy dog today"),
      (1L, s"$boiler completely different content about cooking pasta dishes"),
      (2L, s"$boiler yet another unrelated text discussing quantum physics"),
      (3L, s"$boiler the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val banned = Dedup.frequentShingleHashes(docs, "text",
      shingleK = 3, topN = 50, minDocFrac = 0.9)
    assert(banned.nonEmpty, "shared boilerplate shingles must be detected")
    // threshold 0 surfaces every raw candidate pair the banding emits
    val without = Dedup.minhashCandidates(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val withBan = Dedup.minhashCandidates(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.0,
      bannedShingles = banned)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // boilerplate floods everything into candidacy without the ban
    assert(without.size > withBan.size)
    // the true near-dup pair (0,3) survives the ban
    assert(withBan.contains((0L, 3L)))
    // boilerplate-only pairs are gone
    assert(!withBan.contains((1L, 2L)))
  }

  test("minhash dedup keeps min-id survivor per near-dup cluster") {
    val ids = Dedup.minhashDedup(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids.contains(0L) && ids.contains(3L))
    assert(!ids.contains(1L))
  }

  test("incremental dedup across batches equals one-shot greedy dedup") {
    // cross-batch near-dups: doc 10/11 duplicate docs 0/2 from batch one
    val batch1 = docs
    val batch2 = Seq(
      (10L, base), // exact dup of 0 (history candidate)
      (11L, nearDup.replace("river", "creek")), // near dup of 2
      (12L, "novel second-batch content with entirely fresh vocabulary"),
      (13L, "novel second-batch content with entirely fresh vocabulary")
    ).toDF("doc_id", "text") // 13 dups 12 within-batch
    val prefix = s"incdedup_spec_${System.nanoTime()}"
    try {
      val s1 = Dedup.incrementalMinhashDedup(batch1, prefix, "text",
        "doc_id", threshold = 0.6, buckets = 2)
        .select("doc_id").as[Long].collect().toSet
      val s2 = Dedup.incrementalMinhashDedup(batch2, prefix, "text",
        "doc_id", threshold = 0.6, buckets = 2)
        .select("doc_id").as[Long].collect().toSet
      val oneShot = Dedup.minhashDedup(batch1.unionByName(batch2), "text",
        "doc_id", threshold = 0.6)
        .select("doc_id").as[Long].collect().toSet
      assert((s1 ++ s2) == oneShot,
        s"incremental ${s1 ++ s2} != one-shot $oneShot")
      // the cross-batch dups were caught via HISTORY, not within-batch
      assert(!s2.contains(10L) && !s2.contains(11L) && !s2.contains(13L))
      assert(s2.contains(12L))
    } finally Dedup.dropIncrementalDedupState(spark, prefix)
  }

  test("bucket-count state equals the band-history recount, incl. after compaction") {
    // equality law for the r10 guard: the incrementally-maintained
    // _bucket_counts table (delta appends, bucket-local sums) must agree
    // with the r9 formulation's full recount of _bands at every fold,
    // before and after compaction — and a fold AFTER compaction must still
    // reproduce the one-shot greedy dedup
    import org.apache.spark.sql.functions.sum
    val batch1 = docs
    val batch2 = Seq(
      (10L, base),
      (11L, nearDup.replace("river", "creek")),
      (12L, "novel second-batch content with entirely fresh vocabulary"),
      (13L, "novel second-batch content with entirely fresh vocabulary")
    ).toDF("doc_id", "text")
    val batch3 = Seq(
      (20L, base.replace("dog", "wolf")), // near dup of 0 via history
      (21L, "third batch text with its own vocabulary about glaciers and ice")
    ).toDF("doc_id", "text")
    val prefix = s"bc_spec_${System.nanoTime()}"
    def recount = spark.table(s"${prefix}_bands").groupBy("__bkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the SNAPSHOT read (manifest-live files): inside a compaction
    // retention window the raw table directory deliberately holds both
    // the compacted generation and the superseded deltas, so the
    // directory read is only valid outside the window (post-sweep)
    def maintained = Dedup.readBucketCounts(spark, prefix)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      val s1 = Dedup.incrementalMinhashDedup(batch1, prefix, "text",
        "doc_id", threshold = 0.6, buckets = 2)
        .select("doc_id").as[Long].collect().toSet
      val s2 = Dedup.incrementalMinhashDedup(batch2, prefix, "text",
        "doc_id", threshold = 0.6, buckets = 2)
        .select("doc_id").as[Long].collect().toSet
      assert(maintained == recount)
      Dedup.compactBucketCounts(spark, prefix, buckets = 2)
      assert(maintained == recount)
      // end the retention window so the one-row-per-key shape check
      // below sees only the compacted generation
      Dedup.syncStateToManifest(spark, prefix)
      val ct = spark.table(s"${prefix}_bucket_counts")
      assert(ct.count() == ct.select("__bkey").distinct().count(),
        "compaction must leave one row per bucket key")
      val s3 = Dedup.incrementalMinhashDedup(batch3, prefix, "text",
        "doc_id", threshold = 0.6, buckets = 2)
        .select("doc_id").as[Long].collect().toSet
      assert(maintained == recount)
      val oneShot = Dedup.minhashDedup(
        batch1.unionByName(batch2).unionByName(batch3), "text", "doc_id",
        threshold = 0.6).select("doc_id").as[Long].collect().toSet
      assert((s1 ++ s2 ++ s3) == oneShot,
        s"incremental ${s1 ++ s2 ++ s3} != one-shot $oneShot")
    } finally Dedup.dropIncrementalDedupState(spark, prefix)
  }

  test("near-dedup is idempotent: deduping survivors changes nothing") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val once = Dedup.minhashDedup(real, "text", "doc_id", threshold = 0.8)
    val twice = Dedup.minhashDedup(once, "text", "doc_id", threshold = 0.8)
    assert(once.select("doc_id").as[Long].collect().sorted.toSeq ==
      twice.select("doc_id").as[Long].collect().sorted.toSeq)
    val sem1 = Similarity.semanticDedup(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), threshold = 0.4,
      exact = true)
    val sem2 = Similarity.semanticDedup(sem1, threshold = 0.4, exact = true)
    assert(sem1.select("vec_id").as[Long].collect().sorted.toSeq ==
      sem2.select("vec_id").as[Long].collect().sorted.toSeq)
  }

  test("connected components resolve chained near-dup clusters") {
    // chain: 1-2, 2-3 (1 and 3 never directly paired) + isolated pair 7-9
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (7L, 9L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(7L) == 7L && comps(9L) == 7L)
  }

  test("connected components: distributed path matches driver union-find") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (7L, 9L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // maxDriverEdges=0 forces the iterative hash-to-min regime
    val dist = Dedup.connectedComponents(pairs, maxDriverEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast == dist)
  }

  test("connected components: pointer doubling closes a chain far " +
      "longer than maxIter hops in the distributed regime") {
    // a 200-node path graph (diameter 199): the one-hop neighbor-min
    // loop needed ~200 passes and threw at maxIter=10; with per-pass
    // pointer doubling the remaining diameter halves each pass
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxDriverEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == 200)
    assert(comps.forall(_._2 == 0L), "every node must label to the min id")
  }

  test("connected components: iterative regime leaves no cached RDDs " +
      "and survives a post-spill action") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = Dedup.connectedComponents(pairs, maxDriverEdges = 0)
    // all loop caches must be released INSIDE the call (spill-and-rescan),
    // not deferred to some caller-side unpersist contract
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"iterative CC leaked caches: $leaked")
    // and the returned frame still answers repeated actions (the spill
    // outlives the loop's dropped lineage)
    assert(labels.count() == 5 && labels.count() == 5)
  }

  test("connected components evaluate their upstream exactly once in the " +
      "distributed regime (count-backed persist, no recompute)") {
    // the old limit(max+1) probe stopped once it had max+1 rows, leaving
    // unscanned partitions uncached — the slow path's edge build then
    // re-ran the expensive upstream (LSH candidate generation) for them.
    // An accumulator in the upstream projection counts evaluations: the
    // full run (probe + edge build + label loop) must touch each input
    // row exactly once.
    import org.apache.spark.sql.functions.{col, udf}
    val acc = spark.sparkContext.longAccumulator("cc_upstream_rows")
    val bump = udf { (x: Long) => acc.add(1L); x }
    // 500 two-node components across many partitions; converges fast
    val pairs = spark.range(0, 500, 1, 8)
      .select(bump((col("id") * 2)).as("id_a"), (col("id") * 2 + 1).as("id_b"))
    val comps = Dedup.connectedComponents(pairs, maxDriverEdges = 10)
    assert(comps.count() == 1000L)
    assert(acc.value == 500L,
      s"upstream evaluated ${acc.value} rows — expected exactly 500 " +
        "(each input partition materialized once into the persist)")
  }

  test("connected components: null endpoints dropped, no NPE") {
    val pairs = Seq(("b", "c"), ("a", "b"), (null, "z"), ("x", null))
      .toDF("id_a", "id_b")
    for (mde <- Seq(1000000, 0)) {
      val comps = Dedup.connectedComponents(pairs, maxDriverEdges = mde)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(comps == Map("a" -> "a", "b" -> "a", "c" -> "a"),
        s"maxDriverEdges=$mde")
    }
  }

  test("connected components: supplementary chars label identically in both regimes") {
    // U+1F600 sorts BELOW U+FB00 in UTF-16 char order but ABOVE it in UTF-8
    // byte order (Spark's UTF8String/least semantics) — the driver regime
    // must agree with the distributed one on which id wins
    val pairs = Seq(("😀", "ﬀ")).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val dist = Dedup.connectedComponents(pairs, maxDriverEdges = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(fast == dist)
    assert(fast.values.toSet == Set("ﬀ"))
  }

  test("minhashDedupCC keeps one survivor per connected cluster") {
    val ids = Dedup.minhashDedupCC(docs, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // docs 0,1,4-ish cluster; 3 isolated; survivor set keeps min ids
    assert(ids.contains(0L) && ids.contains(3L))
    assert(!ids.contains(1L))
  }

  test("minhashDedupBest keeps the highest-scoring cluster member, not " +
      "the minimum id, with the id tiebreak on equal scores") {
    import org.apache.spark.sql.functions.col
    // 10/11/12 are exact dups (one cluster); score prefers 11
    val scoredDocs = Seq(
      (10L, base), (11L, base), (12L, base),
      (13L, "completely different content about spark query engines")
    ).toDF("doc_id", "text")
    val score = org.apache.spark.sql.functions
      .when(col("doc_id") === 11L, 2.0).otherwise(1.0)
    val ids = Dedup.minhashDedupBest(scoredDocs, "text", "doc_id", score,
        shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(11L, 13L))
    // all-equal scores: the tie resolves to the minimum id (CC parity)
    val tied = Dedup.minhashDedupBest(scoredDocs, "text", "doc_id",
        org.apache.spark.sql.functions.lit(1.0),
        shingleK = 3, numHashes = 64, bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(tied === Set(10L, 13L))
  }

  test("shingle simhash decorrelates same-vocab shuffled docs where " +
      "unigram simhash collides") {
    // two docs over the SAME small vocabulary in different orders: near-zero
    // shingle overlap (not near-dups), but identical bags-of-words — the
    // templated-corpus shape where unigram simhash (bag-of-words cosine)
    // false-positives (observed: sf0.01 docs 102/473 removed at 0.01 exact
    // Jaccard before the shingle-feature fix)
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val b = a.trim.split(" ").reverse.mkString(" ")
    val two = Seq((0L, a.trim), (1L, b)).toDF("doc_id", "text")
    val r = two.select(
        Dedup.simhash64($"text").as("u"),
        Dedup.simhash64Shingles($"text", 3).as("s"))
      .collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // identical bags: unigram simhash is bit-identical — 0 hamming
    assert(ham(r(0).getLong(0), r(1).getLong(0)) == 0)
    // shingle features: far apart (independent hashes drift to ~32/64)
    assert(ham(r(0).getLong(1), r(1).getLong(1)) > 10)
    // and simhashDedup (shingle features) keeps both docs
    assert(Dedup.simhashDedup(two, "text", "doc_id").count() == 2L)
  }

  test("simhash: identical texts hash equal, near-dups are close in hamming") {
    val sims = docs.select($"doc_id", Dedup.simhash64($"text").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sims(0L) == sims(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(0L), sims(2L)) < 16)
    assert(ham(sims(0L), sims(3L)) > 16)
  }

  test("pre-tokenized and pre-shingled inputs give identical results (tokensOf/shinglesOf dispatch)") {
    import graft.functions.TextFunctions
    val toked = docs.withColumn("__toks",
      TextFunctions.tokens($"text"))
    val shingled = docs.withColumn("__sh3",
      Dedup.shingleHashes($"text", 3))
    def ids(df: org.apache.spark.sql.DataFrame, tc: String): Set[Long] =
      Dedup.minhashDedup(df, tc, "doc_id", threshold = 0.5)
        .select("doc_id").as[Long].collect().toSet
    val fromText = ids(docs, "text")
    assert(ids(toked, "__toks") == fromText)
    assert(ids(shingled, "__sh3") == fromText)
    // decontamination: same flags either way
    val benchDf = docs.filter($"doc_id" === 0)
    def flags(c: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
        tc: String): Map[Long, Boolean] =
      TextPipeline.flagContaminated(c, b, tc, "doc_id", n = 3)
        .select("doc_id", "contaminated").as[(Long, Boolean)]
        .collect().toMap
    assert(flags(toked, toked.filter($"doc_id" === 0), "__toks") ==
      flags(docs, benchDf, "text"))
    // chunking: identical chunk rows from raw text and shared tokens
    val a = TextPipeline.chunkByTokens(docs, "text", "doc_id", 5, 2)
      .collect().map(_.toString).sorted.toSeq
    val b = TextPipeline.chunkByTokens(toked, "__toks", "doc_id", 5, 2)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("minhash mega-bucket is dropped at DEFAULT arguments (no opt-in tuning)") {
    // templated-corpus shape: > maxBucketSize (default 1000) docs with
    // identical text put 1100 ids in every one of their (band, hash)
    // buckets. Default-safety means: (a) the run is bounded — the capped
    // collect never buffers the hot bucket, so no straggler/spill — and
    // (b) an unrelated genuine dup pair in the same corpus still dedups.
    val boiler = (0L until 1100L).map(i =>
      (1000L + i, "boilerplate header repeated across every document"))
    val corpus = ((0L, base) +: (1L, base) +: boiler).toDF("doc_id", "text")
    val ids = Dedup.minhashDedup(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L), "genuine dup pair must still dedup")
    assert(ids.contains(0L))
    // the mega-bucket is suppressed wholesale (bounded work; the recall
    // sacrifice is the documented tradeoff — bannedShingles is the lever)
    assert(ids.count(_ >= 1000L) == 1100)
  }

  test("simhash dedup removes exact dup via banding") {
    val ids = Dedup.simhashDedup(docs, "text", "doc_id",
      maxHamming = 3, bands = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(1L))
    assert(ids.contains(0L) && ids.contains(3L))
  }

  test("crossExactDedup removes reference overlap, keeps within-corpus dups") {
    val ref = Seq((100L, "shared text one"), (101L, "shared text two"),
      (102L, "reference only")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "shared text one"), // in reference -> dropped
      (2L, "corpus only a"),
      (3L, "corpus only a"), // within-corpus dup -> BOTH kept (cross-only)
      (4L, "shared text two"), // in reference -> dropped
      (5L, "corpus only b")).toDF("doc_id", "text")
    val got = Dedup.crossExactDedup(corpus, ref, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L, 5L))
  }

  test("crossExactDedup: FP-heavy bloom and anti-join fallback agree exactly") {
    import org.apache.spark.sql.functions.{concat, lit, when}
    val ref = spark.range(50L).select($"id".as("doc_id"),
      concat(lit("ref doc "), $"id").as("text"))
    val corpus = spark.range(200L).select(($"id" + 1000L).as("doc_id"),
      // ids 1000..1049 duplicate reference texts, the rest are unique
      when($"id" < 50, concat(lit("ref doc "), $"id"))
        .otherwise(concat(lit("corpus doc "), $"id")).as("text"))
    // fpp 0.5: the bloom waves many uniques through as candidates; the
    // exact verify must kill every false positive
    val viaBloom = Dedup.crossExactDedup(corpus, ref, "text", "doc_id",
      fpp = 0.5).select("doc_id").as[Long].collect().sorted.toSeq
    // maxBloomItems=0 forces the plain anti-join fallback
    val viaAnti = Dedup.crossExactDedup(corpus, ref, "text", "doc_id",
      maxBloomItems = 0L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBloom == viaAnti)
    assert(viaBloom == (1050L until 1200L).toSeq)
  }

  test("simhashDedup drops degenerate band buckets under maxBucketSize") {
    // identical docs: every (band, chunk) becomes one mega-bucket — the
    // templated-corpus shape that would go O(n^2) unguarded
    val many = spark.range(200L).select($"id".as("doc_id"),
      org.apache.spark.sql.functions
        .lit("boilerplate header repeated across every document").as("text"))
    // cap below the bucket size: banding is suppressed, all docs survive
    // (bounded work; the recall sacrifice is the documented tradeoff)
    val capped = Dedup.simhashDedup(many, "text", "doc_id",
      maxHamming = 3, bands = 4, maxBucketSize = 100)
    assert(capped.count() == 200L)
    // default cap is far above: collapses to the min-id survivor
    val full = Dedup.simhashDedup(many, "text", "doc_id",
      maxHamming = 3, bands = 4)
    assert(full.count() == 1L)
  }

  test("homoglyphDedup collapses confusable-evasion copies exact dedup " +
      "keeps apart") {
    val df = Seq(
      (1L, "free crypto wallet bonus now"),
      // Cyrillic о/е swaps + zero-width joiner salt
      (2L, "free crypt\u043E wallet b\u043Enus n\u043Ew\u200D"),
      // fullwidth letters + no-break space
      (3L, "\uFF46ree\u00A0crypto wallet bonus now"),
      // Greek capital Omicron after uppercase (lower() runs post-skeleton)
      (4L, "free crypt\u039F wallet bonus now"),
      (5L, "a genuinely different document"))
      .toDF("doc_id", "text")
    val skel = Dedup.homoglyphDedup(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(skel === Seq(1L, 5L))
    // byte-exact dedup sees five distinct texts
    assert(Dedup.exact(df, "text", "doc_id").count() === 5L)
  }

  test("containmentPairs finds an excerpt whole-doc Jaccard misses") {
    // doc2 = a contiguous 8-token slice of doc1: its 6 shingles are ALL
    // in doc1 (containment 1.0) while Jaccard is 6/28 ~ 0.21
    val big = (1 to 30).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 17).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, big), (2L, excerpt)).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(df, "text", "doc_id",
      threshold = 0.8).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === ((1L, 2L, 6L, 28L, 6L, 1.0)))
    // the Jaccard tier must NOT flag this pair as a near-dup
    assert(Dedup.minhashCandidates(df, "text", "doc_id",
      threshold = 0.7).count() == 0L)
  }

  test("containmentPairs: threshold edges and the posting-cap guard") {
    // shared shingles {cde, def} = 2; the SMALLER set is doc1's 5
    // shingles -> containment 2/5 = 0.4 exactly
    val df = Seq(
      (1L, "a b c d e f g"), // shingles: abc bcd cde def efg
      (2L, "c d e f x y z w")) // cde def efx fxy xyz yzw
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id",
      threshold = 0.4).collect()
    assert(got.length == 1 && got(0).getDouble(5) === 0.4)
    assert(Dedup.containmentPairs(df, "text", "doc_id",
      threshold = 0.41).count() == 0L)
    // identical docs beyond the cap: every posting overflows and drops
    val many = (1L to 6L).map(i => (i, "same text in every doc here"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(many, "text", "doc_id",
      threshold = 0.5, maxPostings = 4).count() == 0L)
    assert(Dedup.containmentPairs(many, "text", "doc_id",
      threshold = 0.5).count() == 15L)
  }

  test("crossMinhashDedup accepts pre-tokenized columns and agrees " +
      "with the raw-string path") {
    import org.apache.spark.sql.functions.{col, split}
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq((1L, base + " extra tail"),
      (2L, "entirely different corpus body here"))
      .toDF("doc_id", "text")
    val raw = Dedup.crossMinhashDedup(corpus, ref, "text", "doc_id",
      threshold = 0.7).select("doc_id").as[Long].collect().sorted.toSeq
    val tokCorpus = corpus.select(col("doc_id"),
      split(col("text"), " ").as("text"))
    val tokRef = ref.select(col("doc_id"),
      split(col("text"), " ").as("text"))
    val pre = Dedup.crossMinhashDedup(tokCorpus, tokRef, "text", "doc_id",
      threshold = 0.7).select("doc_id").as[Long].collect().sorted.toSeq
    assert(raw === pre)
    assert(raw === Seq(2L))
  }

  test("crossContainment flags a benchmark doc buried in a larger page " +
      "that Jaccard decontam misses") {
    val bench = (1 to 10).map(i => s"q$i").mkString(" ") // 8 shingles
    val filler1 = (1 to 20).map(i => s"f$i").mkString(" ")
    val filler2 = (1 to 20).map(i => s"g$i").mkString(" ")
    val ref = Seq((100L, bench)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"$filler1 $bench $filler2"), // host page: leakage
      (2L, s"$filler1 $filler2"))        // clean
      .toDF("doc_id", "text")
    val rows = Dedup.crossContainment(corpus, ref, "text", "doc_id",
      threshold = 0.8).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("corpus_id") == 1L &&
      r.getAs[Long]("ref_id") == 100L)
    assert(r.getAs[Double]("containment") === 1.0)
    assert(r.getAs[Long]("shared") === r.getAs[Long]("ref_size"))
    // whole-doc Jaccard of the pair is ~8/50 — the near-dup cross tier
    // (exact verify at threshold 0.8) cannot flag it
    assert(Dedup.crossMinhashCandidates(corpus, ref, "text", "doc_id",
      threshold = 0.8).count() == 0L)
  }

  test("crossMinhashDedup drops near-verbatim reference overlap, keeps " +
      "dissimilar docs and within-corpus near-dups") {
    // 40 distinct tokens -> 38 3-shingles; the corpus near-copy appends
    // two tokens (J = 38/40 = 0.95, deterministically over the 16x4
    // s-curve), the paraphrase swaps every other token (J << 0.7)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val ref = Seq((100L, base), (101L, "unrelated reference body"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base + " extra tail"),          // near-copy of ref -> dropped
      (2L, base),                          // exact copy of ref -> dropped
      (3L, (1 to 40).map(i =>
        if (i % 2 == 0) s"swp$i" else s"tok$i").mkString(" ")), // J~0.0
      (4L, "corpus only document body"),
      (5L, "corpus only document body"))   // within-corpus dup: BOTH kept
      .toDF("doc_id", "text")
    val got = Dedup.crossMinhashDedup(corpus, ref, "text", "doc_id",
      threshold = 0.7).select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 4L, 5L))
  }

  test("crossMinhashCandidates reports the exact jaccard and respects " +
      "the threshold") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val ref = Seq((9L, base)).toDF("doc_id", "text")
    val corpus = Seq((1L, base + " x y")).toDF("doc_id", "text")
    val rows = Dedup.crossMinhashCandidates(corpus, ref, "text", "doc_id",
      threshold = 0.9).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("corpus_id") == 1L &&
      r.getAs[Long]("ref_id") == 9L)
    // 38 shared shingles of 40 in the copy (2 appended tokens -> 2 new)
    assert(math.abs(r.getAs[Double]("jaccard") - 38.0 / 40.0) < 1e-12)
    // a higher threshold excludes the same pair
    assert(Dedup.crossMinhashCandidates(corpus, ref, "text", "doc_id",
      threshold = 0.96).count() == 0L)
  }

  test("minhashDedupBest keeps the best-scoring representative for " +
      "STRING ids too (the long-cast silently deleted whole clusters)") {
    val docs = Seq(
      ("doc-a", "alpha beta gamma delta epsilon zeta", 0.2),
      ("doc-b", "alpha beta gamma delta epsilon zeta", 0.9), // best dup
      ("doc-c", "totally different text about other things", 0.5))
      .toDF("doc_id", "text", "quality")
    val kept = Dedup.minhashDedupBest(docs, "text", "doc_id",
      org.apache.spark.sql.functions.col("quality"), threshold = 0.8)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("doc-b", "doc-c"),
      s"expected the best-quality dup + the singleton, got $kept")
  }

  test("simhashDedup refuses maxHamming >= bands and non-divisor bands " +
      "(silently void recall guarantees)") {
    val two = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashDedup(two, "text", "doc_id", maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashDedup(two, "text", "doc_id", maxHamming = 2, bands = 3)
    }
  }
}
