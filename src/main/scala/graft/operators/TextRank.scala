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
    val withTf = corpus.select(col(idCol),
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
}
