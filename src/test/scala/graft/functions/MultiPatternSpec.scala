package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expr.MultiPatternExprs

/** [[graft.functions.expr.MultiPatternHitCountExpr]] — Aho-Corasick
  * distinct-pattern hit counting, checked against the naive
  * per-pattern `contains` model.
  */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, ps: Seq[String]): Long =
    ps.count(text.contains).toLong

  test("automaton counts equal naive contains on seeded random cases") {
    val rnd = new scala.util.Random(77L)
    val alphabet = "abc"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val patterns = (1 to 12).map(_ => randStr(1 + rnd.nextInt(4))).distinct
    val texts = (0 until 200).map(i => (i.toLong, randStr(rnd.nextInt(40))))
      .filter(_._2.nonEmpty)
    val df = texts.toDF("id", "t")
    val got = df.select(col("id"),
      MultiPatternExprs.multiPatternHits(col("t"), patterns).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === naive(t, patterns), s"text '$t'")
    }
  }

  test("suffix-pattern and overlap edges: every embedded pattern is " +
      "seen exactly once, regardless of overlaps") {
    val patterns = Seq("ab", "b", "aba", "baba", "zz")
    val df = Seq((1L, "ababa"), (2L, "b"), (3L, "zzz"), (4L, "q"))
      .toDF("id", "t")
    val got = df.select(col("id"),
      MultiPatternExprs.multiPatternHits(col("t"), patterns).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "ababa" contains ab, b, aba, baba -> 4; "b" -> 1; "zzz" -> zz only
    assert(got === Map(1L -> 4L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("flagBannedPhrases annotates without disturbing input columns") {
    val df = Seq((1L, "the quick brown fox"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextPipeline.flagBannedPhrases(
      df, "text", Seq("quick brown", "lazy dog"))
    assert(out.columns.toSeq === Seq("doc_id", "text", "n_banned"))
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m === Map(1L -> 1L, 2L -> 0L))
  }
}
