package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.OrphanPolicy

/** Golden-file parity: run the graft medallion pipeline over the reference's
  * own dirty CSVs and compare against the committed outputs of the reference
  * run (`/root/reference/submission_Amadeu/gold`, copied to test resources).
  * `KeepDangling` reproduces the reference's actual (not documented) orphan
  * behavior — SURVEY.md §2.9.
  */
class GoldenParitySpec extends SparkSpec {

  private def res(p: String): String =
    getClass.getResource(s"/reference/$p").getPath

  private lazy val result = LakehousePipeline.run(spark, LakehouseConfig(
    customersCsv = res("data/customers.csv"),
    workOrdersCsv = res("data/work_orders.csv"),
    partsSalesCsv = res("data/parts_sales.csv"),
    outputDir = "target/golden_parity_out",
    orphanPolicy = OrphanPolicy.KeepDangling,
    writeOutputs = true))

  private def golden(p: String): DataFrame =
    spark.read.option("header", "true").csv(res(p))

  /** order-insensitive all-string row-set comparison */
  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq,
      s"columns ${got.columns.toSeq} vs ${want.columns.toSeq}")
    val g = got.select(got.columns.map(c => col(c).cast("string")).toSeq: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    val w = want.collect().map(_.toSeq).sortBy(_.toString)
    assert(g.length == w.length, s"rows ${g.length} vs ${w.length}")
    g.zip(w).foreach { case (a, b) => assert(a == b, s"row $a != $b") }
  }

  test("dim_customer matches the committed golden output (81 rows)") {
    assertSameRows(result.dimCustomer, golden("gold/dim_customer.csv"))
  }

  test("fact_work_order matches the committed golden output (397 rows)") {
    assertSameRows(result.factWorkOrder, golden("gold/fact_work_order.csv"))
  }

  test("fact_parts_sales matches the committed golden output (923 rows)") {
    assertSameRows(result.factPartsSales, golden("gold/fact_parts_sales.csv"))
  }

  test("dim_date matches the committed golden output (355 rows)") {
    assertSameRows(result.dimDate, golden("gold/dim_date.csv"))
  }

  test("the reference's three DQ checks all PASS at rate 0.0") {
    val rows = result.dqResults
      .filter(col("check_name").isin("null_rate_customer_id",
        "duplicate_rate_work_order", "orphan_rate_parts_sales"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[String]("status") == "PASS")
      assert(r.getAs[Double]("metric_value") == 0.0)
    }
  }

  test("run log row counts match the reference run") {
    assert(result.run.rows_dim_customer == 81)
    assert(result.run.rows_fact_work_order == 397)
    assert(result.run.rows_fact_parts_sales == 923)
  }

  test("pipeline is idempotent (rerun produces identical gold)") {
    val again = LakehousePipeline.run(spark, LakehouseConfig(
      customersCsv = res("data/customers.csv"),
      workOrdersCsv = res("data/work_orders.csv"),
      partsSalesCsv = res("data/parts_sales.csv"),
      outputDir = "target/golden_parity_out2",
      orphanPolicy = OrphanPolicy.KeepDangling,
      writeOutputs = false))
    assertSameRows(again.dimCustomer,
      result.dimCustomer.select(
        result.dimCustomer.columns.map(c => col(c).cast("string")).toSeq: _*))
    again.unpersistAll()
  }

  test("MapToUnknown policy conforms the 8 dangling work-order FKs to -1") {
    val documented = LakehousePipeline.run(spark, LakehouseConfig(
      customersCsv = res("data/customers.csv"),
      workOrdersCsv = res("data/work_orders.csv"),
      partsSalesCsv = res("data/parts_sales.csv"),
      outputDir = "target/golden_parity_out3",
      orphanPolicy = OrphanPolicy.MapToUnknown(-1),
      writeOutputs = false))
    val unknownCount = documented.factWorkOrder
      .filter(col("customer_id") === "-1").count()
    // 3 null FKs + 8 dangling C9001..C9008 all map to -1
    assert(unknownCount == 11)
    val danglingLeft = documented.factWorkOrder
      .join(documented.dimCustomer.select("customer_id"),
        Seq("customer_id"), "left_anti").count()
    assert(danglingLeft == 0)
    documented.unpersistAll()
  }
}
