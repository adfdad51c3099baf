package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): slide a window of `w` consecutive k-gram
  * hashes over each document and keep each window's minimum. The selected
  * set is a deterministic ~2/(w+1)-density sample of the document's k-grams
  * with the winnowing guarantee: any shared substring of at least
  * `k + w - 1` tokens between two documents yields at least one SHARED
  * fingerprint — so fingerprint overlap is a sound detector for copied
  * spans, at a fraction of the full shingle set's size.
  *
  * Relation to the MinHash family ([[Dedup]]): MinHash estimates
  * whole-document resemblance; winnowing localizes — it catches a copied
  * paragraph inside an otherwise-different document, which whole-document
  * Jaccard dilutes below any usable threshold. A curation pipeline uses
  * both (near-dedup for templates, fingerprint overlap for partial
  * plagiarism / license-contaminated spans).
  *
  * Portability: the k-gram hash is the k-gram's MD5 hex string and the
  * window minimum is the LEXICOGRAPHIC min of those strings — both exactly
  * reproducible in any engine (the DuckDB oracle replays the whole
  * selection), unlike seed-dependent xxhash64. The join key stays narrow
  * anyway: fingerprints shuffle as the 32-char hash, ~2/(w+1) of the
  * k-gram count per doc.
  *
  * Scale shape: selection is entirely per-row — tokens → k-grams → hashes
  * → window minima as nested higher-order functions, one codegen'd
  * projection, no exchange, no per-doc state beyond the row. The overlap
  * join shuffles (fingerprint, id) pairs only, and boilerplate
  * fingerprints shared by half the corpus are structurally capped by the
  * same capped-collect guard as LSH buckets ([[Dedup]] `bucketPairs`): no
  * task ever buffers more than `maxPostings + 1` ids of one fingerprint.
  */
object Winnow {

  /** Per-document winnowing fingerprints as
    * `(idCol, n_grams, fingerprints: array<string>)`. `k` = tokens per
    * gram, `w` = hashes per window. Documents shorter than `k` tokens
    * fingerprint their whole text as the single gram; gram lists shorter
    * than `w` select their single minimum.
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val toks = TextFunctions.tokensOf(df, textCol)
    // the whole grams → md5 → window-minima → distinct selection is ONE
    // native kernel ([[graft.functions.expr.WinnowFingerprintsExpr]]): the
    // HOF formulation needs the gram-hash array inside the window-min
    // lambda, where CollapseProject inlines the array producer and the
    // interpreter re-evaluates it per window — O(n³) per document.
    // n tokens -> max(n - k + 1, 1) grams.
    graft.Tables.widenForKernel(
        df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol),
        greatest(size(toks) - lit(k - 1), lit(1)).cast("long")
          .as("n_grams"),
        graft.functions.expr.WinnowExprs
          .winnowFingerprints(toks, k, w).as("fingerprints"))
  }

  /** Document pairs sharing at least `minShared` winnowing fingerprints,
    * as `(id_a, id_b, shared)` with `id_a < id_b`. `maxPostings` caps the
    * per-fingerprint posting list (boilerplate guard — a fingerprint
    * carried by b docs otherwise yields b² pairs).
    */
  def overlapPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, w: Int = 4, minShared: Int = 2,
      maxPostings: Int = 1000): DataFrame = {
    val fps = fingerprints(df, textCol, idCol, k, w)
      .select(col(idCol), explode(col("fingerprints")).as("__fp"))
    // same capped-postings + local pair expansion as the LSH buckets
    Dedup.bucketPairs(fps, Seq("__fp"), col(idCol), maxPostings)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("shared"))
      .filter(col("shared") >= minShared)
  }
}
