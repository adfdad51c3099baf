package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-tier law queries (x59–x61): the laws themselves must hold (every
  * boolean column true), plus direct contract checks the law queries can't
  * express — exhaustive no-underestimate probing for count-min and the
  * exact-side values matching an independent computation.
  */
class SketchTierSpec extends SparkSpec {

  test("x59: every slice and the merged estimate within tolerance") {
    val out = QueriesSketch.sketchCardinality(spark, sfDir).collect()
    assert(out.length == 4) // 3 returnflag slices + __merged__
    assert(out.forall(_.getBoolean(2)), out.mkString("; "))
    val mergedRow = out.find(_.getString(0) == "__merged__").get
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(mergedRow.getLong(1) == exact)
  }

  test("x60: rank brackets hold for p50 and p90 in every slice") {
    val out = QueriesSketch.quantileBracket(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      out.mkString("; "))
  }

  test("x61: laws hold and the exact side matches a recount") {
    val out = QueriesSketch.cmsHeavyHitters(spark, sfDir).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      out.mkString("; "))
    // exact side: recount the top token independently
    val top = out.maxBy(_.getLong(1))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0 && col("tok") === top.getString(0))
      .count()
    assert(top.getLong(1) == n)
  }

  test("count-min sketch never underestimates ANY token, not just top-20") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val skBin = toks
      .agg(expr(
        "count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 7)"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(skBin))
    val truth = toks.groupBy("tok").count().collect()
    truth.foreach { r =>
      val est = cms.estimateCount(r.getString(0))
      assert(est >= r.getLong(1),
        s"underestimate for ${r.getString(0)}: $est < ${r.getLong(1)}")
    }
  }

  test("merging per-slice HLL sketches equals sketching the whole column") {
    // the mergeability contract itself: union-of-parts == sketch-of-whole,
    // byte-for-byte on the estimate (deterministic sketch implementation)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val whole = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))"))
      .head().getLong(0)
    val merged = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    assert(whole == merged, s"whole=$whole merged=$merged")
  }
}
