package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three SQL metric queries
  * (`/root/reference/submission_Amadeu/sql/metrics.sql:1-30`), provided both
  * as SQL text (temp-view entry point, reference `pipeline.py:279-318`) and as
  * DataFrame builders.
  */
object Metrics {

  /** 1) parts revenue per customer over the trailing 90 days. */
  val revenuePerCustomerSql: String =
    """SELECT c.customer_id, c.customer_name,
      |       SUM(ps.total_price) AS total_revenue
      |FROM fact_parts_sales ps
      |JOIN fact_work_order wo ON ps.work_order_id = wo.work_order_id
      |JOIN dim_customer c ON wo.customer_id = c.customer_id
      |WHERE ps.sale_date >= CURRENT_DATE - INTERVAL '90' DAY
      |GROUP BY c.customer_id, c.customer_name
      |ORDER BY total_revenue DESC""".stripMargin

  /** 2) orders per status per month. */
  val ordersByStatusMonthSql: String =
    """SELECT DATE_TRUNC('month', order_date) AS month, status,
      |       COUNT(*) AS total_orders
      |FROM fact_work_order
      |GROUP BY DATE_TRUNC('month', order_date), status
      |ORDER BY month, status""".stripMargin

  /** 3) average parts ticket per work order. */
  val avgTicketSql: String =
    """SELECT work_order_id, AVG(total_price) AS avg_ticket
      |FROM fact_parts_sales
      |GROUP BY work_order_id
      |ORDER BY avg_ticket DESC""".stripMargin

  def registerViews(dimCustomer: DataFrame, factWorkOrder: DataFrame,
      factPartsSales: DataFrame): Unit = {
    dimCustomer.createOrReplaceTempView("dim_customer")
    factWorkOrder.createOrReplaceTempView("fact_work_order")
    factPartsSales.createOrReplaceTempView("fact_parts_sales")
  }

  def revenuePerCustomer(spark: SparkSession): DataFrame =
    spark.sql(revenuePerCustomerSql)
  def ordersByStatusMonth(spark: SparkSession): DataFrame =
    spark.sql(ordersByStatusMonthSql)
  def avgTicket(spark: SparkSession): DataFrame = spark.sql(avgTicketSql)

  /** DataFrame builder equivalents (same plans post-Catalyst; the dimension
    * side is explicitly broadcast — a conformed dimension is small relative
    * to facts by construction).
    */
  def revenuePerCustomerDf(dimCustomer: DataFrame, factWorkOrder: DataFrame,
      factPartsSales: DataFrame): DataFrame =
    factPartsSales
      .filter(col("sale_date") >= date_sub(current_date(), 90))
      .join(factWorkOrder.select("work_order_id", "customer_id"),
        Seq("work_order_id"))
      .join(broadcast(dimCustomer.select("customer_id", "customer_name")),
        Seq("customer_id"))
      .groupBy("customer_id", "customer_name")
      .agg(sum("total_price").as("total_revenue"))
      .orderBy(desc("total_revenue"))
}
