package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Malformed-input contracts of the native kernels (round-15 review
  * closures): locale-free lowercasing, null token/element handling, the
  * k >= 1 shingle guard, length/dimension mismatches, and out-of-range
  * bucket ids. The engine's own tokenizers never produce these inputs —
  * the contracts exist for caller-built arrays, and each must be a
  * DEFINED value (skip / NULL / loud require), never an NPE, a silent
  * 0.0, or a locale-dependent answer.
  */
class KernelEdgeSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.expr._

  private def oneTok(arr: Seq[Option[String]]) =
    Seq(Tuple1(arr)).toDF("t")

  test("lang_id_trigram is locale-independent: Turkish default locale " +
      "must not break English trigram matching") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val got = Seq(Tuple1("IS IT THE BEST OF ALL THE THINGS"))
        .toDF("s")
        .select(graft.functions.TextFunctions.langIdTrigram(col("s")).as("l"))
        .as[String].collect()(0)
      assert(got == "en", s"locale-dependent lowercasing: got $got")
    } finally java.util.Locale.setDefault(prev)
  }

  test("shingle kernels skip null-token windows (the ngram_stats " +
      "contract), identically on both the set and TF paths") {
    val clean = oneTok(Seq(Some("a"), Some("b"), Some("c"), Some("d")))
    val nulled = oneTok(Seq(Some("a"), Some("b"), None, Some("c"),
      Some("d")))
    def hashes(df: org.apache.spark.sql.DataFrame) =
      df.select(TextHashExprs.shingleHashes(col("t"), 2).as("h"))
        .as[Seq[Long]].collect()(0).toSet
    // windows of the nulled doc: (a,b) ok, (b,NULL) skip, (NULL,c) skip,
    // (c,d) ok — a strict subset of the clean doc's windows
    assert(hashes(nulled).subsetOf(hashes(clean)))
    assert(hashes(nulled).size == 2)
    // the TF twin sees the SAME windows (shared chain)
    val tf = nulled.select(WeightedMinHashExprs
        .shingleTf(col("t"), 2).as("s"))
      .select(col("s.hashes").as("h")).as[Seq[Long]].collect()(0).toSet
    assert(tf == hashes(nulled))
    // all-null doc degrades to the empty-doc sentinel, never crashes
    assert(oneTok(Seq(None, None))
      .select(TextHashExprs.shingleHashes(col("t"), 2).as("h"))
      .as[Seq[Long]].collect()(0).nonEmpty)
  }

  test("shingle k must be >= 1: k = 0 would collapse every document " +
      "onto the bare seed hash") {
    intercept[IllegalArgumentException] {
      graft.functions.expr.ShingleHashesExpr(null, 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.expr.ShingleTfExpr(null, 0)
    }
  }

  test("simhash64 ignores null tokens (a feature that is not there " +
      "casts no votes)") {
    val a = oneTok(Seq(Some("x"), Some("y")))
      .select(TextHashExprs.simhash64(col("t")).as("h"))
      .as[Long].collect()(0)
    val b = oneTok(Seq(Some("x"), None, Some("y")))
      .select(TextHashExprs.simhash64(col("t")).as("h"))
      .as[Long].collect()(0)
    assert(a == b)
  }

  test("winnowing mirrors concat_ws on null tokens (dropped, no " +
      "separator) instead of crashing") {
    val got = oneTok(Seq(Some("a"), None, Some("b")))
      .select(WinnowExprs.winnowFingerprints(col("t"), 2, 2).as("f"))
      .as[Seq[String]].collect()(0)
    assert(got.nonEmpty) // defined value, no NPE
  }

  test("vector kernels poison null elements and dimension mismatches " +
      "to NULL, never 0.0") {
    val v = Seq(Tuple1(Seq(Some(1.0), None, Some(2.0)))).toDF("v")
    assert(v.select(PqExprs.l2normalize(col("v")).as("n"))
      .filter(col("n").isNull).count() == 1L)
    // centroid_cosines: a 2-dim query against 3-dim centroids is
    // misconfiguration -> NULL row (0.0 scores would argmax to cell 0)
    val cents = Array(Array(1.0, 0.0, 0.0))
    val q = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
    assert(q.select(PqExprs.centroidCosines(col("v"), cents).as("c"))
      .filter(col("c").isNull).count() == 1L)
  }

  test("hyperplaneBucket: a NULL vector gets a NULL bucket (acknowledged " +
      "input, never joins a probe); a non-null wrong-dim vector still " +
      "fails loudly") {
    val planes = VectorFunctions.randomPlanes(4, 3)
    val df = Seq(Tuple1(Option(Seq(1.0, 0.0, 2.0))), Tuple1(None))
      .toDF("v")
    val buckets = df
      .select(VectorFunctions.hyperplaneBucket(col("v"), planes).as("b"))
      .collect()
    // one real bucket, one NULL — and crucially NO raise_error: a single
    // null embedding must not kill a whole lshTopK/nearDupPairs job with
    // a misleading null-message "dimension mismatch"
    assert(buckets.count(_.isNullAt(0)) == 1)
    assert(buckets.count(!_.isNullAt(0)) == 1)
    val bad = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
    val ex = intercept[Exception] {
      bad.select(VectorFunctions.hyperplaneBucket(col("v"), planes))
        .collect()
    }
    assert(ex.getMessage.contains("does not match the configured dim"))
  }

  test("icws_signature refuses a mismatched (hashes, weights) pair " +
      "with NULL instead of silently truncating") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1.0, 2.0))).toDF("h", "w")
    assert(df.select(WeightedMinHashExprs.icwsSignature(col("h"),
        col("w"), Array(7L, 11L)).as("s"))
      .filter(col("s").isNull).count() == 1L)
  }

  test("bucket_mean_score returns NULL on out-of-range bucket ids " +
      "(stale model) instead of crashing or mis-scoring") {
    val df = Seq(Tuple1(Seq(0, 5))).toDF("b") // weights has 2 entries
    assert(df.select(HashNgramExprs.bucketScore(col("b"),
        Array(0.5f, 0.25f), 0.0).as("s"))
      .filter(col("s").isNull).count() == 1L)
  }

  test("hash-ngram and BPE kernels poison null tokens to NULL") {
    val toks = oneTok(Seq(Some("a"), None))
    assert(toks.select(HashNgramExprs.buckets(col("t"), 64, 2).as("b"))
      .filter(col("b").isNull).count() == 1L)
    assert(toks.select(BpeExprs.bpeEncode(col("t"),
        Seq(("a", "b"))).as("e"))
      .filter(col("e").isNull).count() == 1L)
  }
}
