package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composite document-quality filter — the operator a training-data
  * pipeline actually runs: one projection computes every signal (token
  * count, heuristic quality score, language, repetition), one filter keeps
  * the survivors. Signals stay as output columns so downstream stages (and
  * audits) see WHY a document survived.
  *
  * Scale: a single narrow stage — no shuffle, no UDFs; every signal is a
  * column expression over the text column, so the whole filter rides inside
  * one codegen'd scan-project-filter pipeline.
  */
object QualityFilter {

  final case class Config(
      minTokens: Long = 10L,
      minQuality: Double = 0.5,
      langs: Set[String] = Set("en"),
      maxDupWordFrac: Double = 0.3)

  /** Annotate with signals; no filtering. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // the signal expressions tokenize the text several times per row —
    // heavy enough that an undersplit scan (single-row-group testdata:
    // ONE task) serializes the whole corpus onto one core; widen first,
    // with a barrier so apply()'s filter can't be pushed back below the
    // exchange (no-op for frames that are already post-shuffle or cached).
    // Key on a cheap 64-byte prefix hash, not the full text: hashing a
    // whole document per row just to pick a reducer is wasted work, and
    // a prefix collision (duplicate-heavy corpora colocating) only skews
    // a shuffle that fires on undersplit inputs in the first place
    graft.Tables.widenBarrierForKernel(df, xxhash64(substring(t, 1, 64)))
      .withColumn("n_tokens", TextFunctions.tokenCount(t).cast("long"))
      .withColumn("quality", TextFunctions.qualityScore(t))
      .withColumn("lang", TextFunctions.langId(t))
      .withColumn("dup_word_frac", TextFunctions.dupWordFraction(t))
  }

  /** Annotate + keep survivors per `cfg`. */
  def apply(df: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val langOk: Column =
      if (cfg.langs.isEmpty) lit(true)
      else col("lang").isin(cfg.langs.toSeq.sorted: _*)
    annotate(df, textCol)
      .filter(
        col("n_tokens") >= cfg.minTokens &&
          col("quality") >= cfg.minQuality &&
          langOk &&
          col("dup_word_frac") <= cfg.maxDupWordFrac)
  }
}
