package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (HLL-family): engine-specific sketches can't be
  * oracle-matched against DuckDB, so accuracy is asserted against the exact
  * answer instead (SURVEY.md §2.10: `approx_count_distinct` before any
  * custom TypedImperativeAggregate).
  */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_tight"))
      .head()
    val exact = row.getAs[Long]("exact").toDouble
    assert(math.abs(row.getAs[Long]("approx") - exact) / exact < 0.05)
    assert(math.abs(row.getAs[Long]("approx_tight") - exact) / exact < 0.02)
  }

  test("HLL sketches built per-partition union to the global estimate") {
    // the incremental-distinct pattern: sketch each day/partition once,
    // store the binary sketch, and union sketches instead of re-scanning
    // history — O(sketch) merge instead of O(data) recount at 100 TB
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val perGroup = li
      .groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sketch"))
    val merged = perGroup
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est"))
      .head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val row = li.agg(
      expr("percentile(l_quantity, 0.5D)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5D, 10000)").as("approx"))
      .head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) <= 1.0)
  }
}
