package graft.operators

import graft.SparkSpec

/** [[TextRank.textrankKeywords]] — PageRank over token co-occurrence,
  * checked against an independent in-memory model.
  */
class TextRankCentralitySpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replica: adjacency within each doc's token list,
    * self-loops dropped, symmetrized counts, K damped iterations.
    */
  private def model(docs: Seq[Seq[String]], d: Double,
      iters: Int): Map[String, Double] = {
    val ed = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { t =>
      t.sliding(2).foreach {
        case Seq(a, b) if a != b =>
          ed((a, b)) = ed.getOrElse((a, b), 0L) + 1
          ed((b, a)) = ed.getOrElse((b, a), 0L) + 1
        case _ =>
      }
    }
    val deg = ed.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = deg.keySet
    val n = nodes.size
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inbound = nodes.map { v =>
        v -> ed.collect { case ((s, dst), w) if dst == v =>
          w.toDouble / deg(s) * pr(s)
        }.sum
      }.toMap
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * inbound(v))).toMap
    }
    pr
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("centrality matches the independent model on a mixed corpus") {
    val texts = Seq(
      "spark shuffles data across the cluster",
      "the cluster schedules spark tasks",
      "data quality gates the cluster pipeline",
      "pipeline tasks move data")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextRank.textrankKeywords(df, "text", topK = 50)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = model(texts.map(_.split(" ").toSeq), 0.85, 3)
      .view.mapValues(round6).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (tok, s) =>
      assert(math.abs(got(tok) - s) <= 1e-6, s"token $tok")
    }
  }

  test("a symmetric two-token graph sits at the uniform fixed point") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextRank.textrankKeywords(df, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 0.5, "b" -> 0.5))
  }

  test("tokens outside the vocabulary cut contribute no edges") {
    // vocabSize 1 keeps only the most frequent token; no pair has both
    // endpoints in vocab, so the graph (and the result) is empty
    val df = Seq((1L, "a a a b c")).toDF("doc_id", "text")
    assert(TextRank.textrankKeywords(df, "text", topK = 10,
      vocabSize = 1).count() === 0L)
  }
}
