package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.OrphanPolicy
import graft.pipeline.{LakehouseConfig, LakehousePipeline}

/** The reference's three SQL metric queries run against the gold tables
  * produced by the pipeline (SQL entry point 2, SURVEY.md §3.2).
  */
class MetricsSpec extends SparkSpec {

  private def res(p: String): String =
    getClass.getResource(s"/reference/$p").getPath

  private lazy val gold = LakehousePipeline.run(spark, LakehouseConfig(
    customersCsv = res("data/customers.csv"),
    workOrdersCsv = res("data/work_orders.csv"),
    partsSalesCsv = res("data/parts_sales.csv"),
    outputDir = "target/metrics_out",
    orphanPolicy = OrphanPolicy.KeepDangling,
    writeOutputs = false))

  private lazy val registered: Unit =
    Metrics.registerViews(gold.dimCustomer, gold.factWorkOrder,
      gold.factPartsSales)

  test("metric 1 (90-day revenue) runs; fixture data is historical so empty") {
    registered
    val out = Metrics.revenuePerCustomer(spark)
    assert(out.columns.toSeq ==
      Seq("customer_id", "customer_name", "total_revenue"))
    // sale_date range is 2025; a current_date-anchored window in 2026+ is
    // empty — same result the reference itself produces when rerun today
    assert(out.count() >= 0)
  }

  test("metric 1 DataFrame form matches the SQL form") {
    registered
    val sql = Metrics.revenuePerCustomer(spark).collect().toSeq
    val df = Metrics.revenuePerCustomerDf(gold.dimCustomer,
      gold.factWorkOrder, gold.factPartsSales).collect().toSeq
    assert(sql.map(_.toSeq).toSet == df.map(_.toSeq).toSet)
  }

  test("metric 2 (orders by status by month) aggregates all work orders") {
    registered
    val out = Metrics.ordersByStatusMonth(spark)
    assert(out.columns.toSeq == Seq("month", "status", "total_orders"))
    val total = out.agg(sum("total_orders")).head().getLong(0)
    assert(total == gold.factWorkOrder.count())
  }

  test("metric 3 (avg ticket per work order) covers every sold-to order") {
    registered
    val out = Metrics.avgTicket(spark)
    assert(out.columns.toSeq == Seq("work_order_id", "avg_ticket"))
    assert(out.count() ==
      gold.factPartsSales.select("work_order_id").distinct().count())
  }
}
