package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Dataset splitting and sampling for training-data pipelines.
  *
  * Both splitters are pure projections over a key — no shuffle, no state,
  * and stable across runs/engines/cluster layouts, which is the property
  * that matters for reproducible train/eval splits at 100 TB (Spark's
  * `randomSplit` is seed-stable only for a fixed partitioning, so it is NOT
  * reproducible across repartitioned reruns; key-based assignment is).
  */
object Sampling {

  /** Bucket assignment in [0, buckets) by 64-bit key hash — uniform for any
    * key distribution (use for ids with structure, e.g. sequential).
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(xxhash64(key), lit(buckets.toLong)).cast("int")

  /** Deterministic split: rows whose hash bucket falls below
    * `testPermille`/1000 go to the test side. Returns (train, test) —
    * disjoint, exhaustive, reproducible from the key alone.
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
      testPermille: Int = 100): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol), 1000)
    (df.filter(b >= testPermille), df.filter(b < testPermille))
  }

  /** Modulo split on an integer key: portable to any engine (used by the
    * oracle-checked split query); prefer [[deterministicSplit]] when key
    * values may be correlated with data properties.
    */
  def moduloSplit(df: DataFrame, keyCol: String, modulus: Int = 10,
      testResidue: Int = 0): (DataFrame, DataFrame) = {
    val r = pmod(col(keyCol), lit(modulus))
    (df.filter(r =!= testResidue), df.filter(r === testResidue))
  }

  /** Stratified sample: per-stratum fractions without replacement
    * (`df.stat.sampleBy`), seeded. Use to rebalance skewed strata (e.g.
    * per-language document quotas) in one pass.
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Portable deterministic keep-decision: multiplicative hash of the id
    * (Knuth's 2654435761) modulo the prime 1000003, compared against an
    * integer threshold. Computed with modular arithmetic only — no value
    * exceeds ~10^12, so ANSI mode can't overflow, and any engine
    * reproduces it bit-for-bit from the id alone.
    */
  private val SampleMod = 1000003L
  def sampleHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(SampleMod)) *
      lit(2654435761L % SampleMod), lit(SampleMod))

  /** Budget-targeted mixture sampling — the dataset-mixing step of
    * training-corpus assembly (The Pile / DoReMi-style source weights):
    * given per-source target weights `w_s` and a total `tokenBudget`,
    * derive each source's keep rate from its ACTUAL token mass,
    * `rate_s = min(1, budget * w_s / tokens_s)`, and keep each document by
    * [[sampleHash]] — so the realized mixture approximates
    * `budget * w_s` tokens per source and the sample is deterministic
    * across engines, partitionings, and reruns (`sample()`/`randomSplit`
    * are not).
    *
    * Scale shape: one partial-aggregated groupBy collapses the corpus to
    * #sources rows (collected to the driver — sources number in the
    * hundreds, not millions), then the tiny threshold table broadcasts
    * back for a row-local filter. The corpus itself never shuffles.
    * Sources missing from `targetWeights` get weight 0 (dropped).
    */
  def mixtureSample(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String, targetWeights: Map[String, Double],
      tokenBudget: Long, tokenCountCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // tokensOf: textCol may be raw text or a shared pre-tokenized array;
    // a caller that already carries a token COUNT (e.g. QualityFilter's
    // n_tokens annotation upstream in a funnel) names it via
    // tokenCountCol and the mass pass skips tokenization entirely
    val toks = tokenCountCol match {
      case Some(c) => col(c).cast("long")
      case None =>
        size(graft.functions.TextFunctions.tokensOf(df, textCol))
          .cast("long")
    }
    // coalesce: a source whose token counts are ALL null sums to null,
    // and decoding null into a primitive Long fails the whole job —
    // treat it as zero mass (rate 0, like an empty source). Null-source
    // rows keep their null key through the aggregate AND the join below
    // (dropped by inner-join-on-null): filtered here so the behavior is
    // explicit, not an accident of join semantics.
    val srcTokens = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(coalesce(sum(toks), lit(0L)).as("__tokens"))
      .as[(String, Long)].collect()
    val thresholds = srcTokens.toSeq.map { case (s, t) =>
      val w = targetWeights.getOrElse(s, 0.0)
      val rate = if (t <= 0) 0.0 else math.min(1.0, tokenBudget * w / t)
      (s, math.floor(rate * SampleMod).toLong)
    }.toDF(sourceCol, "__thresh")
    df.join(broadcast(thresholds), Seq(sourceCol))
      .filter(sampleHash(col(idCol)) < col("__thresh"))
      .drop("__thresh")
  }

  /** Per-source document quota (the RefinedWeb / C4 host-capping rule): keep
    * at most `quota` documents per source, preferring the highest
    * `scoreCol`, id-tiebroken — so one boilerplate-heavy crawl host can't
    * dominate the mixture no matter how many pages it contributed.
    *
    * Scale shape: `row_number <= k` over `(source)` is rewritten by Spark's
    * `WindowGroupLimit` rule into a per-partition top-k BEFORE the window
    * exchange, so the shuffle carries at most `quota` rows per source per
    * input partition — the corpus never materializes a full per-source sort.
    * Skew-safe by construction: the pre-limit bounds even a source holding
    * half the corpus. The (score, id) ordering is total, so the kept set is
    * deterministic across engines and partitionings.
    */
  def sourceQuota(df: DataFrame, sourceCol: String, idCol: String,
      score: Column, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(score.desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Temperature-scaled mixture weights (the multilingual-LM resampling
    * rule, Conneau & Lample 2019): `w_s = m_s^tau / Σ_t m_t^tau` over the
    * per-source masses `m_s` (token counts, byte counts). `tau = 1`
    * reproduces the natural distribution, `tau -> 0` the uniform one;
    * the standard 0.7 lifts low-resource sources without drowning the
    * head. Masses arrive pre-aggregated (one groupBy collapses the
    * corpus to #sources rows); the weight map feeds [[mixtureSample]] as
    * its `targetWeights`. Accumulation runs in source-sorted order so
    * the normalizer is deterministic for a given mass table.
    */
  def temperatureWeights(masses: Map[String, Long],
      tau: Double): Map[String, Double] = {
    require(tau > 0, "tau must be positive")
    val pows = masses.toSeq.sortBy(_._1)
      .map { case (s, m) => (s, math.pow(m.toDouble, tau)) }
    val z = pows.map(_._2).sum
    require(z > 0, "temperatureWeights: no positive mass")
    pows.map { case (s, p) => (s, p / z) }.toMap
  }

  /** Leakage-safe train/val/test assignment: split by the NEAR-DUP
    * COMPONENT a document belongs to, not by the document itself — a
    * doc-keyed split puts near-duplicates of training documents into the
    * eval sets, silently inflating every held-out metric (the
    * train/test-contamination failure mode the decontamination tier
    * guards against, applied to the corpus's own split). Every member of
    * a near-dup cluster lands in the SAME split by construction.
    *
    * Mechanism: MinHash-LSH candidate pairs at `threshold` (the
    * [[Dedup.minhashCandidates]] pipeline, exact-Jaccard-verified) →
    * connected components → each doc keyed by its component
    * representative (min id; singletons by their own id) → the portable
    * [[sampleHash]] of that representative buckets the component whole:
    * test below `testPermille`/1000, then val below
    * (`testPermille`+`valPermille`)/1000, train otherwise.
    *
    * Scale shape: the pair graph is dup-bounded (orders of magnitude
    * below the corpus), components ride [[Dedup.connectedComponents]]'s
    * bounded union-find / hash-to-min loop, and the final assignment is
    * one broadcast-able left join + a row-local projection — the corpus
    * shuffles nothing. Deterministic across runs, engines, and
    * partitionings from ids alone.
    *
    * STABILITY UNDER CORPUS GROWTH (the re-crawl contract): appending
    * documents with FRESH, LARGER ids never reassigns an existing
    * document unless the new documents BRIDGE two of its existing
    * near-dup components. Non-bridging growth — new singletons, new
    * clusters among themselves, new members attaching to one existing
    * component — leaves every existing component's min id (its
    * representative) and therefore its split untouched; a new member
    * joining a component inherits that component's existing split. When
    * growth DOES merge components, the merged cluster is re-keyed by
    * the smaller min id and lands whole in that key's split: members of
    * the other component move — necessarily, because leakage safety
    * requires a near-dup cluster to live in ONE split, so co-location
    * wins over assignment stickiness. Ids that are reused or smaller
    * than existing ones void the contract (the min-id representative
    * could flip without any merge).
    *
    * @return one row per input doc: (idCol, rep, split)
    */
  def leakSafeSplit(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, testPermille: Int = 100,
      valPermille: Int = 100): DataFrame = {
    require(testPermille >= 0 && valPermille >= 0 &&
      testPermille + valPermille <= 1000, "permilles must fit in [0,1000]")
    // the assignment hash casts the representative id to long: a
    // non-numeric id type would cast to null and fall through the
    // when-chain, silently assigning the ENTIRE corpus to 'train' (or
    // throwing mid-job under ANSI). The split's determinism contract
    // depends on the numeric cast, so refuse other id types up front.
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case t => throw new IllegalArgumentException(
        s"leakSafeSplit: idCol must be an integral type (the split " +
          s"hash is defined on the id's long value); got ${t.catalogString}")
    }
    val pairs = Dedup.minhashCandidates(df, textCol, idCol,
      threshold = threshold)
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("comp"))
    val tTest = SampleMod * testPermille / 1000L
    val tVal = SampleMod * (testPermille + valPermille) / 1000L
    val h = sampleHash(col("rep"))
    df.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("rep"))
      .withColumn("split",
        when(h < tTest, "test").when(h < tVal, "val").otherwise("train"))
  }
}
