package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Winnow]] — winnowing fingerprint selection and overlap pairs.
  *
  * The fingerprint kernel ([[graft.functions.expr.WinnowFingerprintsExpr]])
  * is checked against an independent plain-Scala model of the SIGMOD-2003
  * selection (grams → md5 hex → per-window lexicographic minima →
  * first-occurrence distinct) — the model is also what the x64 DuckDB
  * oracle replays, so kernel = model = oracle close the triangle.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4
  private val w = 4

  /** Independent model: the straightforward quadratic formulation. */
  private def model(tokens: Seq[String]): (Long, Seq[String]) = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val grams =
      if (tokens.length >= k) tokens.sliding(k).map(_.mkString(" ")).toSeq
      else Seq(tokens.mkString(" "))
    val hs = grams.map(md5hex)
    val mins =
      if (hs.length >= w) hs.sliding(w).map(_.min).toSeq
      else Seq(hs.min)
    (grams.length.toLong, mins.distinct)
  }

  test("fingerprints equal the independent model on random token arrays") {
    // seeded generator; tiny vocabulary cases force repeated grams (tie +
    // distinct paths), mixed-vocab cases cover the general shape
    val rnd = new scala.util.Random(20260814L)
    val vocabSmall = Vector("a", "b", "c", "dog", "ünïcode")
    val cases: Seq[(Long, Seq[String])] = (0 until 120).map { i =>
      val n = rnd.nextInt(41)
      val toks = Seq.fill(n) {
        if (i % 2 == 0) vocabSmall(rnd.nextInt(vocabSmall.size))
        else s"t${rnd.nextInt(30)}"
      }
      (i.toLong, toks)
    }
    val df = cases.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "text", "doc_id", k, w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[String](2))))
      .toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) === model(toks), s"doc $id toks=$toks")
    }
  }

  test("degenerate documents: empty, single-token, exactly-k tokens") {
    val df = Seq(
      (1L, ""), (2L, "solo"), (3L, "one two three four"))
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "text", "doc_id", k, w)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2)))
    val exp = Seq(
      (1L, model(Nil)), (2L, model(Seq("solo"))),
      (3L, model(Seq("one", "two", "three", "four"))))
      .map { case (id, (n, f)) => (id, n, f) }
    assert(got.toSeq === exp)
  }

  test("winnowing guarantee: a shared >= k+w-1 token span yields a " +
      "shared fingerprint, and overlapPairs reports the pair") {
    val span = (1 to (k + w - 1)).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta gamma $span delta epsilon"),
      (2L, s"$span zeta eta theta iota kappa"),
      (3L, "completely different words with no common span at all here"))
      .toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(df, "text", "doc_id", k, w,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("overlapPairs: maxPostings drops boilerplate fingerprints " +
      "instead of expanding them") {
    // 6 identical docs: every fingerprint's posting list holds all 6 ids;
    // posting cap 4 < 6 drops every bucket (overflow-marked), so no pairs
    // survive — the LSH-bucket-guard policy
    val boiler = "this footer is identical in every single document body"
    val df = (1L to 6L).map(i => (i, boiler)).toDF("doc_id", "text")
    val capped = Winnow.overlapPairs(df, "text", "doc_id", k, w,
      minShared = 1, maxPostings = 4)
    val open = Winnow.overlapPairs(df, "text", "doc_id", k, w,
      minShared = 1, maxPostings = 1000)
    assert(capped.count() === 0L)
    assert(open.count() === 15L) // all C(6,2) pairs share the boiler span
  }
}
