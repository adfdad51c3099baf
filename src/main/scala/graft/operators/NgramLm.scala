package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained token-bigram language models for perplexity-style quality
  * filtering (the CCNet / Wenzek et al. 2020 signal: documents whose LM
  * score is far from the corpus norm are boilerplate or noise). Training
  * and scoring are one pass each over exact counts, so the whole
  * computation is deterministic and engine-reproducible:
  *
  *  - vocabulary = top `vocabSize` lowercased tokens by (count desc,
  *    token asc) — a total order, no sampling; everything else maps to
  *    `<unk>`;
  *  - bigram counts B(w1,w2) and prefix counts U(w1) over mapped tokens;
  *  - [[scoreDocs]]: P(w2|w1) = (B + 1) / (U + V + 1) (add-one smoothing
  *    over the vocab+unk event space);
  *  - [[scoreDocsKneserNey]]: interpolated Kneser-Ney with absolute
  *    discount D — P = max(B-D,0)/U + (D·N1+(w1,•)/U)·(N1+(•,w2)/N1+(•,•))
  *    — the standard production smoothing, whose continuation probability
  *    scores a token by how many CONTEXTS it follows rather than raw
  *    frequency (the "San Francisco" effect: "francisco" is frequent but
  *    predictable, so its continuation mass is tiny);
  *  - doc score = mean ln P over its bigrams, rounded to 6dp (libm `ln`
  *    differs across engines only in final ulps; the rounding absorbs it).
  *
  * Scale shape: counts are partial-aggregated groupBys over (8-byte-ish)
  * token keys; the scoring join keys on (w1,w2) against a counts table
  * bounded by the corpus's distinct mapped bigrams (≤ (V+1)^2); the
  * vocabulary join broadcasts. KN adds two more bounded count tables
  * (per-prefix fan-out, per-suffix context count) and one scalar
  * (distinct bigram types) — same join discipline. No driver collect
  * beyond the V-row vocabulary.
  */
object NgramLm {

  /** Per-document mapped-bigram stream `(idCol, __w1, __w2)` — shared
    * front of both scorers. */
  private def bigrams(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(TextFunctions.tokens(lower(col(textCol))))
        .as(Seq("__pos", "__w")))

    val vocab = toks.groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit(vocabSize)
      .select(col("__w"), lit(true).as("__in_vocab"))

    val mapped = toks.join(broadcast(vocab), Seq("__w"), "left")
      .select(col(idCol), col("__pos"),
        when(col("__in_vocab"), col("__w")).otherwise(lit("<unk>"))
          .as("__m"))
    mapped
      .withColumn("__m2", lead(col("__m"), 1)
        .over(Window.partitionBy(idCol).orderBy("__pos")))
      .filter(col("__m2").isNotNull)
      .select(col(idCol), col("__m").as("__w1"), col("__m2").as("__w2"))
  }

  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 4096): DataFrame = {
    val bg = bigrams(df, textCol, idCol, vocabSize)
    val bCounts = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__b"))
    val uCounts = bg.groupBy("__w1").agg(count(lit(1)).as("__u"))

    val vPlus1 = vocabSize.toLong + 1L
    val scored = bg
      .join(bCounts, Seq("__w1", "__w2"))
      .join(uCounts, Seq("__w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("__b") + 1).cast("double") /
          (col("__u") + vPlus1).cast("double"))), 6).as("avg_logp"))

    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 formulation) with fixed absolute discount `discount`.
    * Scoring the training corpus itself means every scored bigram has
    * B >= 1, so the discounted term is well-defined and the probability
    * strictly positive. Output: `(idCol, n_bigrams, avg_logp_kn)`.
    */
  def scoreDocsKneserNey(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 4096, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount in (0,1)")
    val bg = bigrams(df, textCol, idCol, vocabSize)
    val bCounts = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__b"))
    val uCounts = bg.groupBy("__w1").agg(count(lit(1)).as("__u"))
    // continuation statistics, all over bigram TYPES (distinct pairs):
    // fan-out N1+(w1,•), context count N1+(•,w2), total types N1+(•,•)
    val fanOut = bCounts.groupBy("__w1").agg(count(lit(1)).as("__f"))
    val contexts = bCounts.groupBy("__w2").agg(count(lit(1)).as("__p"))
    val totalTypes = bCounts.agg(count(lit(1)).as("__t"))

    val p =
      greatest(col("__b").cast("double") - lit(discount), lit(0.0)) /
        col("__u").cast("double") +
        lit(discount) * col("__f").cast("double") /
          col("__u").cast("double") *
          (col("__p").cast("double") / col("__t").cast("double"))
    val scored = bg
      .join(bCounts, Seq("__w1", "__w2"))
      .join(uCounts, Seq("__w1"))
      .join(fanOut, Seq("__w1"))
      .join(contexts, Seq("__w2"))
      .crossJoin(broadcast(totalTypes))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(p)), 6).as("avg_logp_kn"))

    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp_kn"))
  }

  /** Collocation extraction (Church & Hanks 1990 pointwise mutual
    * information over adjacent token pairs): the corpus phrases whose
    * words co-occur far above chance — "new york"-style units for
    * tokenizer seeding and index phrase detection; the unsupervised
    * complement of raw bigram frequency (which x52/x19 already rank).
    *
    * `pmi(a,b) = ln( c_ab · N / (c_a · c_b) )` with c_ab the adjacent-
    * pair count, c_a/c_b token occurrence counts, N total tokens — all
    * exact longs from the shared bigram front; the formula evaluates in
    * doubles with a mirrored operation order, so the oracle agrees
    * bitwise behind 6dp rounding. `minCount` suppresses the unstable
    * low-count tail (PMI's known pathology: a pair seen once between two
    * hapaxes scores maximal); the final top-k is totally ordered by
    * (pmi desc, w1, w2) — a TakeOrdered, never a global sort.
    *
    * Scale shape: identical to the LM scorers — one corpus-sized token
    * explode + per-doc lead window, then everything aggregates to
    * bigram-TYPE cardinality; N rides in as a broadcast single-row agg
    * (the x68 convention), never a driver collect.
    */
  def collocations(df: DataFrame, textCol: String, idCol: String,
      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    // three consumers re-run the tokenize kernel from the scan; widen so
    // each runs at full parallelism (the repartition exchange is shared
    // via reuse, the undersplit single-task scan pays it once)
    val toks = graft.Tables.widenForKernel(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("__pos", "__w")))
    val uni = toks.groupBy("__w").agg(count(lit(1)).as("__c"))
    // total token count folds off the distinct-token histogram — one
    // aggregate over token TYPES instead of a third full tokenize pass
    val total = uni.agg(sum(col("__c")).as("__n"))
    val bg = toks
      .withColumn("__w2", lead(col("__w"), 1)
        .over(Window.partitionBy(col(idCol)).orderBy("__pos")))
      .filter(col("__w2").isNotNull)
      .groupBy(col("__w").as("w1"), col("__w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    // broadcast DIRECTION matters at scale: bg (post-minCount collocation
    // candidates) is small, uni (ALL distinct corpus tokens) is not — a
    // 100 TB corpus has billions of token types, so uni must stream as
    // the probe side while bg and its enriched successor broadcast
    val withCa = uni.select(col("__w").as("w1"), col("__c").as("__ca"))
      .join(broadcast(bg), Seq("w1"))
    val withBoth = uni.select(col("__w").as("w2"), col("__c").as("__cb"))
      .join(broadcast(withCa), Seq("w2"))
    withBoth
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(log(
        col("n_ab").cast("double") * col("__n").cast("double") /
          (col("__ca").cast("double") * col("__cb").cast("double"))), 6))
      .select(col("w1"), col("w2"), col("n_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
