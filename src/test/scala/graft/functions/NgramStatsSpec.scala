package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expr.TextHashExprs

class NgramStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String, n: Int): Row =
    Seq(Tuple1(text)).toDF("text")
      .select(TextHashExprs.ngramStats(
        TextFunctions.tokens(col("text")), n).as("s"))
      .select("s.*").head()

  test("counts total/distinct/top over word n-grams") {
    // bigrams of [a b a b c]: "a b","b a","a b","b c" -> total 4,
    // distinct 3, top ("a b", 2)
    val s = stats("a b a b c", 2)
    assert(s.getLong(0) == 4L && s.getLong(1) == 3L)
    assert(s.getLong(2) == 2L && s.getString(3) == "a b")
  }

  test("tie on count breaks to the lexicographically smallest ngram") {
    // bigrams of [b a b a]: "b a" x2? -> b a, a b, b a: counts b a=2,
    // a b=1 — not a tie; use [z y x w]: all distinct, tie at 1 -> "w" is
    // not first... bigrams: "z y","y x","x w" -> smallest is "x w"
    val s = stats("z y x w", 2)
    assert(s.getLong(2) == 1L && s.getString(3) == "x w")
  }

  test("non-ASCII ties break in UTF-8 BINARY order, not UTF-16 " +
      "code-unit order") {
    // U+FF21 FULLWIDTH A: UTF-8 EF BC A1, UTF-16 unit 0xFF21.
    // U+10000 LINEAR B:   UTF-8 F0 90 80 80, UTF-16 surrogates 0xD800....
    // UTF-16 code-unit order (String.compareTo) would pick "𐀀"
    // (0xD800 < 0xFF21); UTF-8 byte order (the oracle's and parquet's
    // binary collation) picks "Ａ" (0xEF < 0xF0).
    val fullwidthA = "Ａ"
    val linearB = new String(Character.toChars(0x10000))
    val s = Seq(Tuple1(Seq(fullwidthA, linearB))).toDF("toks")
      .select(TextHashExprs.ngramStats(col("toks"), 1).as("s"))
      .select("s.*").head()
    assert(s.getLong(2) == 1L)
    assert(s.getString(3) == fullwidthA,
      s"expected UTF-8 binary order tie-break, got ${s.getString(3)}")
  }

  test("degenerate docs: fewer tokens than n yields the empty stats row") {
    val s = stats("one two", 3)
    assert(s.getLong(0) == 0L && s.getLong(1) == 0L && s.getLong(2) == 0L)
    assert(s.isNullAt(3))
  }

  test("windows containing a NULL token are skipped, never collapsed " +
      "onto a shorter ngram") {
    // tokens [a, NULL, b, a, b]: bigram windows (a,NULL) and (NULL,b)
    // must contribute NOTHING — concatWs would join them as "a"/"b",
    // and (a,NULL) must NOT collide with a genuine "a b". Counted
    // windows: (b,a), (a,b) -> total 2, distinct 2, top "a b" (tie to
    // binary-smallest); total == sum(counts) holds.
    val s = Seq(Tuple1(Seq(Some("a"), Option.empty[String], Some("b"),
        Some("a"), Some("b")))).toDF("toks")
      .select(TextHashExprs.ngramStats(col("toks"), 2).as("s"))
      .select("s.*").head()
    assert(s.getLong(0) == 2L && s.getLong(1) == 2L)
    assert(s.getLong(2) == 1L && s.getString(3) == "a b")
    // all windows null-tainted -> the empty stats row
    val e = Seq(Tuple1(Seq(Some("a"), Option.empty[String], Some("b"))))
      .toDF("toks")
      .select(TextHashExprs.ngramStats(col("toks"), 2).as("s"))
      .select("s.*").head()
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getLong(2) == 0L)
    assert(e.isNullAt(3))
  }

  test("n=1 reduces to word counts (parity with topWordFraction parts)") {
    val s = stats("a a b", 1)
    assert(s.getLong(0) == 3L && s.getLong(1) == 2L)
    assert(s.getLong(2) == 2L && s.getString(3) == "a")
  }

  test("x98 fractions match a hand-computed doc") {
    // text chars = 11; bigrams of [a b a b c]: top "a b" count 2 len 3
    // -> top2 = 2*3/9? text "a b a b c" has length 9
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val r = df.select(
        TextHashExprs.ngramStats(toks, 2).as("s2"),
        length(col("text")).cast("double").as("nc"))
      .select((col("s2.top_count").cast("double") *
        length(col("s2.top_ngram")).cast("double") / col("nc")).as("f"))
      .as[Double].head()
    assert(r == 2.0 * 3.0 / 9.0)
  }
}
