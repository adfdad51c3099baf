package graft.dq

import java.time.Instant
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline-run audit log (reference D6,
  * `/root/reference/src/pipeline.py:258-259,333-366`, spec
  * `README_CANDIDATO.md:85-92`): one row per run with a uuid id, ISO start/end
  * timestamps, duration, and the gold row counts.
  */
final case class PipelineRun(
    run_id: String,
    started_at: String,
    ended_at: String,
    duration_seconds: Double,
    rows_dim_customer: Long,
    rows_fact_work_order: Long,
    rows_fact_parts_sales: Long)

object RunLog {

  def start(): (String, Instant) = (UUID.randomUUID().toString, Instant.now())

  def finish(runId: String, startedAt: Instant, rowsDimCustomer: Long,
      rowsFactWorkOrder: Long, rowsFactPartsSales: Long): PipelineRun = {
    val ended = Instant.now()
    PipelineRun(
      runId,
      startedAt.toString,
      ended.toString,
      (ended.toEpochMilli - startedAt.toEpochMilli) / 1000.0,
      rowsDimCustomer,
      rowsFactWorkOrder,
      rowsFactPartsSales)
  }

  def toDf(spark: SparkSession, run: PipelineRun): DataFrame = {
    import spark.implicits._
    Seq(run).toDF().select(
      "run_id", "started_at", "ended_at", "duration_seconds",
      "rows_dim_customer", "rows_fact_work_order", "rows_fact_parts_sales")
  }
}
