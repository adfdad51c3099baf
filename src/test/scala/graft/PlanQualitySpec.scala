package graft

import org.apache.spark.sql.DataFrame

/** Plan-quality regression tests: the properties that make these queries
  * scale (pushdown reaching the scan, pruned read schemas, broadcast star
  * joins, no shuffle before partial aggregation) are asserted against the
  * physical plan so a refactor can't silently regress them.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q04 star join broadcasts both dimension sides") {
    val p = plan(QueriesCore.topkRevenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q04 prunes the lineitem scan to 2 columns") {
    val p = plan(QueriesCore.topkRevenue(spark, sfDir))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      p.take(2000))
  }

  test("q09 pushes the part-size filter into the parquet scan") {
    val p = plan(QueriesCore.joinAnti(spark, sfDir))
    assert(p.contains("LessThanOrEqual(p_size,10)"), p.take(2000))
  }

  test("q01 aggregates partially before the exchange") {
    val p = plan(QueriesCore.aggPricing(spark, sfDir))
    val partial = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(partial >= 0 && exchange >= 0)
    // plan prints top-down: final agg, exchange, partial agg, scan — the
    // text after the exchange must contain another HashAggregate (partial)
    assert(p.indexOf("HashAggregate", exchange) > exchange, p.take(2000))
  }

  test("dedup exact shuffles hashes, not document text") {
    val df = graft.operators.Dedup.exact(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")
    val p = plan(df)
    // the aggregation side reads only (doc_id, text->hash); the exchange
    // carries the 8-byte hash key, visible as xxhash64 in the plan
    assert(p.contains("xxhash64"), p.take(2000))
  }

  test("whole-stage codegen covers the scan-project-filter spine of q15") {
    // under AQE the pre-execution plan hides codegen stages; disable it for
    // this one assertion so the static physical plan shows the codegen spans
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = plan(QueriesCore.scalarFuncs(spark, sfDir))
      // "*(n)" prefixes mark whole-stage-codegen stages in the compact form
      assert(p.contains("*(1)"), p.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
