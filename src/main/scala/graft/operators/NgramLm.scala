package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained token-bigram language model for perplexity-style quality
  * filtering (the CCNet / Wenzek et al. 2020 signal: documents whose LM
  * score is far from the corpus norm are boilerplate or noise). Training
  * and scoring are one pass each over exact counts, so the whole
  * computation is deterministic and engine-reproducible:
  *
  *  - vocabulary = top `vocabSize` lowercased tokens by (count desc,
  *    token asc) — a total order, no sampling; everything else maps to
  *    `<unk>`;
  *  - bigram counts B(w1,w2) and prefix counts U(w1) over mapped tokens;
  *  - P(w2|w1) = (B + 1) / (U + V + 1) (add-one smoothing over the
  *    vocab+unk event space);
  *  - doc score = mean ln P over its bigrams, rounded to 6dp (libm `ln`
  *    differs across engines only in final ulps; the rounding absorbs it).
  *
  * Scale shape: counts are partial-aggregated groupBys over (8-byte-ish)
  * token keys; the scoring join keys on (w1,w2) against a counts table
  * bounded by the corpus's distinct mapped bigrams (≤ (V+1)^2); the
  * vocabulary join broadcasts. No driver collect beyond the V-row
  * vocabulary.
  */
object NgramLm {

  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int = 4096): DataFrame = {
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
    val bg = mapped
      .withColumn("__m2", lead(col("__m"), 1)
        .over(Window.partitionBy(idCol).orderBy("__pos")))
      .filter(col("__m2").isNotNull)
      .select(col(idCol), col("__m").as("__w1"), col("__m2").as("__w2"))

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
}
