package graft.pipeline

import graft.engine.SparkEnv
import graft.operators.OrphanPolicy

/** CLI entry point for the medallion pipeline — the counterpart of the
  * reference's `python pipeline.py` run (`/root/reference/src/pipeline.py:372`).
  *
  * Usage:
  *   graft.pipeline.Main <customers.csv> <work_orders.csv> <parts_sales.csv> \
  *     <outputDir> [keep-dangling|map-to-unknown]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: graft.pipeline.Main <customers.csv> <work_orders.csv> " +
          "<parts_sales.csv> <outputDir> [keep-dangling|map-to-unknown]")
      sys.exit(2)
    }
    val policy = args.lift(4) match {
      case Some("keep-dangling") => OrphanPolicy.KeepDangling
      case _ => OrphanPolicy.MapToUnknown(-1)
    }
    val spark = SparkEnv.compatSession(appName = "graft-lakehouse")
    val result = LakehousePipeline.run(spark, LakehouseConfig(
      customersCsv = args(0), workOrdersCsv = args(1),
      partsSalesCsv = args(2), outputDir = args(3), orphanPolicy = policy))
    println(
      s"run ${result.run.run_id}: dim_customer=${result.run.rows_dim_customer} " +
        s"fact_work_order=${result.run.rows_fact_work_order} " +
        s"fact_parts_sales=${result.run.rows_fact_parts_sales} " +
        s"duration=${result.run.duration_seconds}s")
    result.dqResults.show(20, truncate = false)
    result.unpersistAll()
    spark.stop()
  }
}
