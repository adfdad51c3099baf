package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JSON round-trip with explicit schema preserves rows and types") {
    val orig = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    orig.write.mode("overwrite").json("target/src_json")
    val back = JsonSource.typed(spark, "target/src_json", orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.agg(sum("o_totalprice")).head().getDouble(0) ==
      orig.agg(sum("o_totalprice")).head().getDouble(0))
  }

  test("XML round-trip with explicit schema preserves rows and values") {
    val orig = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    XmlSource.write(orig, "target/src_xml", rowTag = "nation")
    val back = XmlSource.typed(spark, "target/src_xml", "nation", orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    val a = orig.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ORC round-trip preserves rows; filters push into the ORC scan") {
    val orig = spark.read.parquet(s"$sfDir/part.parquet")
    OrcSource.write(orig, "target/src_orc")
    val back = OrcSource.read(spark, "target/src_orc")
    assert(back.count() == orig.count())
    val filtered = back.filter(col("p_size") <= 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(p_size,10)"), plan.take(1500))
    assert(filtered.count() ==
      orig.filter(col("p_size") <= 10).count())
  }
}
