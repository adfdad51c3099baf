package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expr.TextHashExprs

/** Lexical relevance ranking for corpus curation: BM25 (Robertson-Spärck
  * Jones probabilistic relevance, the Okapi formulation) of every document
  * against a bounded query vocabulary. The training-data use is seed-set
  * expansion / quality retrieval — "rank the crawl by similarity to a
  * trusted seed corpus" (the GPT-3 WebText-similarity filter shape) — and
  * ad-hoc needle queries over a lakehouse of text.
  *
  * Scale shape: the query vocabulary is SMALL by definition (a query, or
  * the salient terms of a seed corpus — hundreds, not millions), so it
  * rides the task binary and the corpus never shuffles:
  *  - pass 1 collapses the corpus to `2 + |terms|` driver numbers (N,
  *    Σdl, per-term document frequencies) via one partially-aggregated
  *    scan — the per-doc tf vector comes from
  *    [[graft.functions.expr.TermCountsExpr]], one hash-probe pass per
  *    doc, O(|doc|) regardless of |terms|;
  *  - pass 2 scores each document row-locally with the idf constants
  *    folded into the projection. No join, no exchange; the caller's
  *    top-k is a TakeOrdered over (score, id).
  * Two corpus passes, ten-ish driver doubles between them — the same
  * eager-bounded-collect contract as [[Sampling.mixtureSample]].
  */
object TextRank {

  /** BM25 scores of every document containing at least one query term, as
    * `(idCol, score)` (unrounded; callers round before cross-engine
    * comparison — float summation order across 8+ terms is fixed here,
    * left-to-right in `terms` order, but engines' `ln` may differ at ulp
    * scale). Standard parameters k1=1.2, b=0.75; idf is the "+1" variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`, nonnegative for any df.
    */
  def bm25(corpus: DataFrame, textCol: String, idCol: String,
      terms: Array[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val toks = TextFunctions.tokensOf(corpus, textCol)
    // both passes (corpus stats, scoring) re-run the tokenize+termCounts
    // kernel; widen so they run at full parallelism instead of on the
    // undersplit scan task
    val withTf = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        size(toks).cast("long").as("__dl"),
        TextHashExprs.termCounts(toks, terms).as("__tf"))
    // pass 1: N, Σdl (exact long — avgdl derives in the driver, one
    // deterministic double division), df per term, in ONE aggregation
    val statAggs =
      Seq(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl")) ++
        terms.indices.map(i =>
          sum(when(col("__tf")(i) > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*).head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n
    val idf = terms.indices.map { i =>
      val df = stats.getLong(2 + i).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    // pass 2: row-local score, fixed left-to-right summation over terms
    val score = terms.indices.map { i =>
      val tf = col("__tf")(i).cast("double")
      lit(idf(i)) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / avgdl))
    }.reduce(_ + _)
    withTf
      .filter(aggregate(col("__tf"), lit(0L), _ + _) > 0)
      .select(col(idCol), score.as("score"))
  }

  /** All-pairs document cosine similarity over term-frequency shingle
    * vectors, via an inverted-index join (the Bayardo/DISCO all-pairs
    * shape): `(id_a, id_b, dot, cosine)` with `id_a < id_b` and
    * cosine >= `minSim`. The complement of the [[graft.operators.Dedup]]
    * Jaccard family — cosine weights repeated shingles by multiplicity, so
    * it separates "same template, different fill" from "same text twice"
    * where set-Jaccard scores both alike.
    *
    * Cross-engine exactness by construction: every accumulated quantity is
    * an integer (dot = Σ tf_a·tf_b, per-doc norm² = Σ tf², both BIGINT —
    * associative, scheduling-independent), and the only floating point is
    * ONE final `dot / sqrt(double(n2_a)·double(n2_b))` per pair — IEEE
    * correctly-rounded ops on exactly-representable inputs, bit-identical
    * in any engine. An idf weighting would make every partial sum a
    * scheduling-ordered double accumulation; its curation job — damping
    * ubiquitous shingles — is done exactly by `maxDf` instead.
    *
    * Scale shape: `maxDf` bounds every posting list, so the self-join
    * emits at most df²/2 pairs per shingle — the df cap is to the
    * inverted-index join exactly what the bucket cap is to LSH, and it
    * drops precisely the near-zero-idf boilerplate shingles a weighted
    * variant would discount anyway. Shuffles carry (hash, id, tf) — never
    * text. The df filter reuses the groupBy(g) partitioning for its join
    * back onto postings (no extra exchange of the posting stream).
    */
  def shingleCosinePairs(corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, maxDf: Int = 100,
      minSim: Double = 0.5): DataFrame = {
    val tfStruct = Dedup.shingleTf(col(textCol), shingleK)
    val postings = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("__id"), tfStruct.as("__tf"))
      .select(col("__id"),
        explode(arrays_zip(col("__tf.hashes"), col("__tf.weights")))
          .as("__e"))
      .select(col("__id"), col("__e.hashes").as("__g"),
        col("__e.weights").cast("long").as("__c"))
    val keptTerms = postings.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("__g"))
    val kept = postings.join(keptTerms, Seq("__g"))
    val norms = kept.groupBy(col("__id"))
      .agg(sum(col("__c") * col("__c")).as("__n2"))
    val dots = kept.select(col("__g"), col("__id").as("id_a"),
        col("__c").as("__ca"))
      .join(kept.select(col("__g"), col("__id").as("id_b"),
        col("__c").as("__cb")), Seq("__g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__ca") * col("__cb")).as("dot"))
    dots
      .join(norms.select(col("__id").as("id_a"), col("__n2").as("__na")),
        Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("__n2").as("__nb")),
        Seq("id_b"))
      .withColumn("cosine", col("dot").cast("double") /
        sqrt(col("__na").cast("double") * col("__nb").cast("double")))
      .filter(col("cosine") >= minSim)
      .select(col("id_a"), col("id_b"), col("dot"), col("cosine"))
  }

  /** TextRank proper (Mihalcea & Tarau 2004): PageRank over the token
    * co-occurrence graph — corpus-level salient terms by graph
    * centrality, the unsupervised complement of [[tfidfKeywords]]'
    * frequency weighting (a token ranks high by being adjacent to other
    * well-connected tokens, not by raw count). Returns the top `topK`
    * tokens as `(token, score)` with the 6dp-rounded PageRank.
    *
    * Graph: nodes = the top-`vocabSize` tokens (total-ordered cut, as
    * [[NgramLm]]); edges = ADJACENT token pairs (both endpoints in
    * vocab, self-loops dropped), symmetrized with occurrence-count
    * weights. `iterations` damped-PageRank steps from the uniform
    * vector: PR(i) = (1-d)/N + d·Σ_j w_ji/wdeg(j)·PR(j).
    *
    * Scale + determinism contract (the eager-bounded-collect pattern of
    * [[bm25]] / the x29 classifier): the corpus collapses ONCE to the
    * vocabulary-sized edge table (one bigram shuffle, persisted and
    * released before return); each iteration is an edge-keyed join +
    * combiner-backed sum over that table — never the corpus; the ONLY
    * driver materialization is the final ≤ vocabSize PR vector. Edge
    * weights and degrees are exact longs; per-node contribution sums
    * are double additions whose scheduling order can differ across
    * engines by final ulps — the 6dp rounding absorbs that (the
    * x46/x54 convention).
    */
  def textrankKeywords(corpus: DataFrame, textCol: String, topK: Int = 20,
      vocabSize: Int = 4096, damping: Double = 0.85,
      iterations: Int = 3): DataFrame = {
    require(topK >= 1 && iterations >= 1, "topK, iterations >= 1")
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    // token arrays stay row-local: adjacency is derivable per row by
    // zipping the array against its own 1-shift (the Bpe pair-count
    // shape), so no document id, no posexplode, and no full-token
    // Window shuffle+sort ever exist in this plan. The two-select
    // boundary is load-bearing: the consumer references __t four times
    // and tokens() is non-cheap, so CollapseProject keeps the producing
    // projection — tokens() evaluates once per row, not per reference.
    val toksArr = corpus.select(
      TextFunctions.tokens(lower(col(textCol))).as("__t"))
    // persisted: both endpoint broadcasts consume it, and their differing
    // projections defeat exchange reuse — without the persist the full
    // corpus-tokenizing vocabulary aggregation runs once PER endpoint
    val vocab = toksArr.select(explode(col("__t")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc).limit(vocabSize)
      .select(col("__w"))
      .persist()
    // adjacency in the ORIGINAL stream: a non-vocab token between two
    // vocab tokens breaks the pair, which the endpoint joins reproduce
    // (the pair exists only if BOTH raw neighbors survive the filter)
    val bg = toksArr
      .filter(size(col("__t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("__p"))
      .select(col("__p.0").as("__a"), col("__p.1").as("__b"))
      .filter(col("__a") =!= col("__b"))
      .join(broadcast(vocab.select(col("__w").as("__a"))), Seq("__a"))
      .join(broadcast(vocab.select(col("__w").as("__b"))), Seq("__b"))
    // both directions from ONE bigram row: a unionAll here re-runs the
    // whole tokenize+window subtree per branch (exchange reuse does not
    // cover the post-exchange Window stage) — the x85 duplication class
    val edges = bg.select(explode(array(
        struct(col("__a").as("__src"), col("__b").as("__dst")),
        struct(col("__b").as("__src"), col("__a").as("__dst")))).as("__e"))
      .select(col("__e.__src").as("__src"), col("__e.__dst").as("__dst"))
      .groupBy("__src", "__dst").agg(count(lit(1)).as("__wt"))
      .persist()
    try {
      import spark.implicits._
      // the rank/degree state is vocabulary-bounded (<= vocabSize rows),
      // so it iterates DRIVER-side: each PageRank step is exactly one job
      // over the persisted edge table joined against the broadcast local
      // state. Chaining the steps as lazy frames instead builds a
      // recompute pyramid — materializing step k's broadcast re-runs
      // steps 1..k-1's contribution aggregations (they are not persisted),
      // turning 3 iterations into ~6 edge scans.
      val wdegLocal = edges.groupBy(col("__src"))
        .agg(sum(col("__wt")).as("__deg"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val n = wdegLocal.length
      if (n == 0) return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("token",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
      var prLocal: Map[String, Double] =
        wdegLocal.map { case (s, _) => s -> (1.0 / n) }.toMap
      for (_ <- 1 to iterations) {
        // per-edge arithmetic kept IDENTICAL to the declarative form
        // ((wt / deg) * pr, summed per destination) so the 6dp contract
        // is the only cross-engine tolerance in play
        val state = wdegLocal.toSeq
          .map { case (s, d) => (s, d, prLocal(s)) }
          .toDF("__src", "__deg", "__pr")
        val contrib = edges
          .join(broadcast(state), Seq("__src"))
          .select(col("__dst").as("__n"),
            (col("__wt").cast("double") / col("__deg").cast("double") *
              col("__pr")).as("__c"))
          .groupBy(col("__n")).agg(sum(col("__c")).as("__s"))
          .collect()
        // symmetric edges: every node has inbound mass, no default fill
        prLocal = contrib.map(r => r.getString(0) ->
          ((1.0 - damping) / n + damping * r.getDouble(1))).toMap
      }
      val top = prLocal.toSeq.toDF("__n", "__pr")
        .select(col("__n").as("token"), round(col("__pr"), 6).as("score"))
        .orderBy(desc("score"), asc("token"))
        .limit(topK)
        .as[(String, Double)].collect().toSeq
      top.toDF("token", "score")
    } finally { edges.unpersist(); vocab.unpersist() }
  }

  /** Per-document top-`k` TF-IDF keywords as
    * `(idCol, term, tf, df, score, rank)` — the classic salient-term
    * extractor (corpus labeling, topic tagging, index-term selection).
    * idf is the smoothed `ln((N + 1)/(df + 1))`, positive for every
    * non-universal term; `score` is 4dp-rounded BEFORE ranking and ties
    * break on the term string, so the selection is total-ordered and
    * cross-engine reproducible (both tf and df are exact integers; the
    * single `ln`+division sits behind the rounding, the x54 BM25
    * contract).
    *
    * Scale shape: tokens shuffle ONCE as (id, term) pairs to build exact
    * per-doc tf (map-side combined); df aggregates the already-deduped
    * (id, term) stream on term (combiner-backed, no distinct-expansion);
    * N joins in as a broadcast single-row aggregate, keeping the plan
    * fully declarative (no eager driver collect). The per-doc top-k
    * window partitions on the DOCUMENT id — per-partition size is
    * bounded by document length, so unlike a per-bucket LSH sort this
    * window has no hot-key failure mode at corpus scale.
    */
  def tfidfKeywords(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = TextFunctions.tokensOf(corpus, textCol)
    val tf = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = corpus.select(col(idCol)).agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", round(
        col("tf").cast("double") *
          log((col("__n") + lit(1)).cast("double") /
            (col("df") + lit(1)).cast("double")), 4))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }
}
