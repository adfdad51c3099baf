package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group an event stream into
  * sessions per user, where a gap of more than `gapSeconds` between
  * consecutive events starts a new session.
  *
  * Same semantics as Structured Streaming's `session_window` (half-open
  * sessions merged while gaps < gap); implemented with window functions so
  * results are deterministic and oracle-checkable in plain SQL. The streaming
  * counterpart lives in [[graft.streaming.Streams]].
  *
  * Scale: one shuffle on the user key; per-user local sort. Session ids are
  * per-user running sums — no global coordination.
  */
object Sessionize {

  def apply(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(byUser)
    val newSession = when(
      prev.isNull || (micros - prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__new_session", newSession)
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session aggregate: start/end, event count, exact duration in
    * microseconds (integer arithmetic — deterministic across engines).
    */
  def aggregate(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame =
    apply(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"))

  /** Top-`topK` session paths: the first `maxLen` event types of each
    * session in (ts, id) order joined with " > ", counted across all
    * sessions — the product-analytics "user journey" report (and, for a
    * collection pipeline, the dominant crawl/processing traces).
    *
    * Determinism: within-session order is the total (ts, id) order; the
    * path string truncates at `maxLen`; ranking is (sessions DESC, path
    * ASC) — all exact. Scale: the per-session collect is bounded by
    * `maxLen` AFTER the sort-truncate, but the sort buffers one SESSION
    * (gap-bounded, the session contract) — same per-user shape as
    * [[apply]]'s window; the path histogram then aggregates
    * combiner-backed on the path string, and the final top-k is a
    * TakeOrdered.
    */
  def topPaths(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type", gapSeconds: Long = 1800L,
      maxLen: Int = 5, topK: Int = 10): DataFrame = {
    require(maxLen >= 1 && topK >= 1, "maxLen, topK >= 1")
    val paths = apply(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(collect_list(struct(unix_micros(col(tsCol)).as("__us"),
        col(idCol).as("__eid"), col(typeCol).as("__t"))).as("__evs"))
      .select(array_join(
        slice(transform(array_sort(col("__evs")), e => e("__t")),
          1, maxLen), " > ").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("sessions"))
      .orderBy(desc("sessions"), asc("path"))
      .limit(topK)
  }
}
