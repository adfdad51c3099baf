package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (string ops + higher-order functions) — no UDFs, so whole-stage codegen
  * spans stay intact and each function is a pure projection: zero shuffles,
  * embarrassingly parallel at 100 TB.
  *
  * The reference exercises no string functions at all (SURVEY.md §2.8); this
  * module is part of the LLM-data-pipeline extension tier (SURVEY.md §7.4).
  */
object TextFunctions {

  /** Whitespace-collapse + trim + lowercase normalization. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Unicode NFC canonical composition (native codegen'd expression):
    * composed and decomposed accent sequences — 'é' vs 'e'+U+0301 —
    * become byte-identical, so downstream hashing/dedup cannot split on
    * encoding-form accidents. Apply before [[normalize]] when the corpus
    * may mix forms (scraped web text always does).
    */
  def nfc(text: Column): Column =
    graft.functions.expr.UnicodeNormExprs.nfc(text)

  /** [[normalize]] with Unicode NFC composition first — the full CCNet-
    * style canonical form for cross-crawl dedup and fingerprinting.
    */
  def normalizeUnicode(text: Column): Column = normalize(nfc(text))

  /** 64-bit document fingerprint over normalized text (xxhash64 — the same
    * hash family Spark uses for shuffle hashing; stable across runs).
    */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  /** Hex MD5 content fingerprint (portable across engines, e.g. for oracle
    * comparison and cross-system dedup ledgers).
    */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Whitespace tokens (empty input -> empty array, not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Tokens of `textCol`, passing a PRE-TOKENIZED `array<string>` column
    * through unchanged. Multi-stage pipelines (dedup → decontaminate →
    * sample → chunk) tokenize the corpus ONCE, persist the array, and
    * hand the same column to every stage — at 100 TB, re-tokenizing per
    * stage is several full extra CPU passes over the corpus. The
    * dispatch is on the column's TYPE, so operators taking a `textCol`
    * accept either form with no signature change.
    */
  def tokensOf(df: org.apache.spark.sql.DataFrame, textCol: String): Column =
    df.schema(textCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => col(textCol)
      case _ => tokens(col(textCol))
    }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex splitting on letter runs, digit
    * runs, and individual punctuation — an upper-bound proxy for tokenizer
    * cost accounting when the real tokenizer can't run engine-side.
    */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])" +
        "|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => length(trim(t)) > 0))

  def charCount(text: Column): Column = length(text)

  // All ratio/score builders are null-in -> null-out: a NULL document
  // has no statistics. Returning 0.0 there (the old otherwise-branch
  // accident) conflated "missing" with "empty", and qualityScore was
  // actively WRONG: least()/greatest() skip nulls, so a NULL document's
  // length score silently became 1.0 and the composite scored 0.79 —
  // comfortably past the default 0.5 keep-threshold. Empty strings
  // (length 0) still score 0.0 — that is a real, measurable document.
  def avgWordLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0,
      aggregate(tokens(text), lit(0).cast("double"),
        (acc, t) => acc + length(t)) / n)
      .when(text.isNotNull, lit(0.0))
  }

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
        .cast("double") / length(text))
      .when(text.isNotNull, lit(0.0))

  /** Fraction of characters that are ASCII letters or space. */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
        length(text))
      .when(text.isNotNull, lit(0.0))

  /** Fraction of tokens that appear in `stopwords` (signal of natural prose
    * vs. boilerplate/code; standard quality heuristic in web-scale corpus
    * cleaning, cf. C4/Gopher rules).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    val n = tokenCount(text)
    when(n > 0,
      size(filter(tokens(text), t => array_contains(sw, lower(t))))
        .cast("double") / n)
      .when(text.isNotNull, lit(0.0))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Composite document-quality score in [0,1]: rewards prose-like length,
    * moderate word length, low punctuation noise. Deterministic, tunable.
    */
  def qualityScore(text: Column): Column = {
    val lenScore =
      least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val wordLenOk = {
      val awl = avgWordLength(text)
      when(awl >= 2.5 && awl <= 12.0, 1.0).otherwise(0.3)
    }
    val punctOk = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.4)
    when(text.isNotNull,
      (lenScore * 0.5) + (wordLenOk * 0.3) + (punctOk * 0.2))
      .cast("double")
  }

  /** Language-marker profiles: top frequent function words per language.
    * Used by [[langId]]; markers chosen to be mutually exclusive across
    * the profiled languages.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "como", "pero"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "que"),
    "pt" -> Seq("o", "os", "um", "uma", "nao", "em", "do", "da"))

  /** N-gram/function-word language ID heuristic: score = fraction of tokens
    * matching each language's marker set; returns the argmax language or
    * "und" (undetermined) when no marker hits. Pure column expression —
    * distributable with zero shuffle.
    */
  def langId(text: Column,
      markers: Map[String, Seq[String]] = LangMarkers): Column = {
    val toks = tokens(lower(text))
    val scored: Seq[(String, Column)] = markers.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        val sw = array(words.map(lit): _*)
        lang -> size(filter(toks, t => array_contains(sw, t)))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // fold in reverse so the alphabetically-first language reaching the max
    // wins the tie — deterministic across engines and runs
    scored.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score > 0 && score === best, lit(lang)).otherwise(acc)
    }
  }

  /** Repetition signals (Gopher-style quality heuristics — Rae et al. 2021
    * §A1.1): fraction of repeated words / repeated word bigrams, and the
    * mass of the single most frequent word. High values flag boilerplate,
    * keyword stuffing, and degenerate generations. All are exact
    * integer-ratio doubles, so a SQL oracle reproduces them bit-for-bit.
    */
  def dupWordFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
      .when(text.isNotNull, lit(0.0))
  }

  /** Count of the most frequent word over total words. O(distinct * n) per
    * doc via HOFs — fine for document-sized inputs; single consumer, so no
    * projection-collapse blowup.
    */
  def topWordFraction(text: Column): Column = {
    val toks = tokens(text)
    val counts = transform(array_distinct(toks),
      d => size(filter(toks, t => t === d)))
    when(size(toks) > 0,
      array_max(counts).cast("double") / size(toks).cast("double"))
      .when(text.isNotNull, lit(0.0))
  }

  /** Repeated word-bigram fraction: 1 - distinct bigrams / total bigrams
    * (distinct counted via the native 64-bit shingle-hash set).
    */
  def dupBigramFraction(text: Column): Column = {
    val toks = tokens(text)
    val nBigrams = size(toks) - 1
    when(nBigrams > 0,
      lit(1.0) -
        size(graft.functions.expr.TextHashExprs.shingleHashes(toks, 2))
          .cast("double") / nBigrams.cast("double"))
      .when(text.isNotNull, lit(0.0))
  }

  /** Character-trigram-profile language ID (native expression,
    * [[graft.functions.expr.TrigramLangIdExpr]]): no tokenization, catches
    * morphology ("-ung", "-ção", "-ción") rather than only function words,
    * one primitive pass per document. Prefer this over [[langId]] for noisy
    * web text where closed-class markers may be absent.
    */
  def langIdTrigram(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.expr.TrigramLangIdExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))
}
