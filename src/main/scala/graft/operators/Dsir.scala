package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): pick pretraining documents that LOOK LIKE a small trusted target
  * corpus by importance-weighting each candidate under two hashed bag-of-
  * ngrams models (unigrams + bigrams, the paper's feature set), one fit on
  * the target slice and one on the raw pool:
  *
  *   log w(doc) = Σ_tokens [ log p_target(bucket(tok)) − log p_raw(bucket(tok)) ]
  *
  * with add-one smoothing over `numBuckets` feature buckets. Documents with
  * positive log-weight resemble the target more than the pool; selection
  * keeps those (or the top-k by weight).
  *
  * Scale shape (the reason DSIR beats classifier-based selection at 100 TB):
  * both models are `numBuckets`-bounded histograms — ONE partial-aggregated
  * groupBy collapses the exploded token stream to ≤ numBuckets rows
  * (map-side combine makes the shuffle ≤ numBuckets rows per task,
  * independent of corpus size). The model then BROADCASTS back (a few KB)
  * and scoring is a broadcast-hash-join + per-doc partial sum: the shuffle
  * carries one (id, partialSum) row per doc per task, never tokens, never
  * text. No training loop, no driver-side iteration — two passes total.
  *
  * The feature hash is deliberately engine-portable (the DuckDB oracle
  * replays it verbatim): fold `(h*31 + codepoint) % 1000003` over the
  * token's characters — folding from 0 equals DuckDB `list_reduce`'s
  * first-element initialization because `0*31 + c = c` — then take
  * `% numBuckets`. Features are restricted to ASCII-alpha tokens so
  * Spark's `ascii` and DuckDB's `unicode` agree on every character.
  */
object Dsir {

  /** Fold modulus: prime, and small enough that `h*31 + c` stays far from
    * Long overflow under ANSI mode.
    */
  val HashMod = 1000003L

  /** Portable bucket of one lowercase-ASCII token (see object doc). */
  def bucketOf(tok: Column, numBuckets: Int): Column = {
    val codes = transform(sequence(lit(1), length(tok)),
      i => ascii(tok.substr(i, lit(1))).cast("long"))
    pmod(aggregate(codes, lit(0L),
      (acc, c) => pmod(acc * lit(31L) + c, lit(HashMod))),
      lit(numBuckets.toLong)).cast("int")
  }

  /** Hashed-feature buckets of a document: lowercase, whitespace-tokenize
    * (or pass a pre-tokenized array through), keep ASCII-alpha tokens,
    * hash each. Duplicate tokens stay duplicated — these are bag counts.
    *
    * `maxNgram = 2` (the paper's feature set) additionally hashes every
    * consecutive pair of SURVIVING tokens as the space-joined string
    * `"tok1 tok2"` through the SAME codepoint fold — space is codepoint
    * 32 in both engines (`ascii(' ')` == DuckDB `unicode(' ')`), so the
    * oracle replays bigrams with plain `||` concatenation. Pairing after
    * the alpha filter keeps the feature set a pure function of the
    * filtered token sequence (punctuation/numeric noise can't break a
    * phrase in two engines differently).
    */
  def featureBuckets(df: DataFrame, textCol: String, numBuckets: Int,
      maxNgram: Int = 2): Column = {
    require(maxNgram == 1 || maxNgram == 2, "maxNgram must be 1 or 2")
    val toks = TextFunctions.tokensOf(df, textCol)
    val ft = filter(transform(toks, lower(_)), _.rlike("^[a-z]+$"))
    val uni = transform(ft, tk => bucketOf(tk, numBuckets))
    if (maxNgram == 1) uni
    else {
      // zip the filtered list against itself shifted by one; greatest
      // guards the empty/singleton doc (slice rejects negative lengths)
      val n1 = greatest(size(ft) - 1, lit(0))
      val bi = zip_with(slice(ft, lit(1), n1), slice(ft, lit(2), n1),
        (a, b) => bucketOf(concat(a, lit(" "), b), numBuckets))
      concat(uni, bi)
    }
  }

  /** Per-document importance log-weights against a target slice.
    *
    * @param isTarget row predicate defining the trusted target corpus
    *                 (e.g. `col("lang") === "en"`, a curated source, a
    *                 quality-classifier-positive slice)
    * @param maxNgram 2 (default) = the paper's hashed unigram+bigram
    *                 features; 1 = unigram-only (cheaper, order-blind)
    * @return one row per document that has ≥1 feature:
    *         (idCol, n_feats: long, logw: double rounded to 6dp,
    *         kept: boolean = logw > 0)
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, numBuckets: Int = 4096,
      maxNgram: Int = 2): DataFrame = {
    val b = numBuckets.toDouble
    // one explode serves both model fitting and scoring; widen first —
    // the tokenize+hash kernel on an undersplit scan (single-row-group
    // testdata: ONE task) would otherwise run the whole corpus on one core
    val feats = graft.Tables.widenForKernel(df, col(idCol))
      .select(col(idCol), isTarget.as("__is_t"),
        explode(featureBuckets(df, textCol, numBuckets, maxNgram))
          .as("__b"))
    // raw + target histograms in one pass; ≤ numBuckets rows survive
    val counts = feats.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"))
    val totals = counts.agg(
      sum("__cr").as("__nr"), sum("__ct").as("__nt"))
    // add-one-smoothed log-likelihood ratio per bucket (tiny: ≤ numBuckets
    // rows × one-row totals)
    val model = counts.crossJoin(totals).select(
      col("__b"),
      (log((col("__ct") + lit(1.0)) / (col("__nt") + lit(b))) -
        log((col("__cr") + lit(1.0)) / (col("__nr") + lit(b)))).as("__lr"))
    feats.join(broadcast(model), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum("__lr"), 6).as("logw"))
      .withColumn("kept", col("logw") > lit(0.0))
  }
}
