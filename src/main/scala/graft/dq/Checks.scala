package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One evaluated data-quality check (reference D5 ledger row format,
  * `/root/reference/README_CANDIDATO.md:72-83`, `src/pipeline.py:248-251`).
  */
final case class DqResult(
    check_name: String,
    table_name: String,
    metric_value: Double,
    threshold: Double,
    status: String,
    details: String)

/** Threshold-based data-quality checks (reference D2-D4,
  * `/root/reference/src/pipeline.py:189-253`; thresholds
  * `submission_Amadeu/metadata.json:17-21`).
  *
  * Design difference vs the reference (SURVEY.md §7.3): the reference runs 6+
  * separate `count()` jobs and computes rates in driver Python; here each
  * table's checks collapse into ONE aggregation job
  * (`agg(sum(when(...)), count_distinct(...), count(*))`) — a single scan and
  * a partial-aggregate shuffle of one row per partition, which is the shape
  * that survives 100 TB. Orphan rate still needs its own anti-join pass, but
  * the anti-join is key-only (column-pruned) and broadcastable when the parent
  * key set is small.
  */
object Checks {

  /** Null rate + duplicate rate of `key` in one pass. */
  def keyRates(df: DataFrame, key: String): (Double, Double) = {
    val row = df
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(key).isNull, 1L).otherwise(0L)).as("nulls"),
        countDistinct(col(key)).as("uniq"))
      .head()
    val n = row.getAs[Long]("n")
    if (n == 0L) (0.0, 0.0)
    else {
      val nulls = Option(row.getAs[Long]("nulls")).getOrElse(0L)
      val uniq = row.getAs[Long]("uniq")
      // reference formula (pipeline.py:214-216) is
      // (count - select(key).distinct().count()) / count, and DataFrame
      // distinct() counts NULL as ONE distinct value — unlike the
      // COUNT(DISTINCT) aggregate, which excludes nulls entirely. countDistinct
      // here excludes nulls, so add the null group back when present.
      val uniqWithNull = uniq + (if (nulls > 0L) 1L else 0L)
      (nulls.toDouble / n, (n - uniqWithNull).toDouble / n)
    }
  }

  def nullRate(df: DataFrame, column: String): Double = keyRates(df, column)._1

  def dupRate(df: DataFrame, key: String): Double = keyRates(df, key)._2

  /** Fraction of child rows whose FK has no match in the parent PK set
    * (anti-join formulation, reference `pipeline.py:227-246`). Null FKs count
    * as orphans only if `countNullFk` (the reference's anti-join does NOT
    * match nulls, so they surface as orphans there; we keep that default).
    */
  def orphanRate(child: DataFrame, fk: String, parent: DataFrame, pk: String,
      broadcastParent: Boolean = true): Double = {
    val total = child.count()
    if (total == 0L) return 0.0
    val keys0 = parent.select(col(pk).as("__pk")).distinct()
    val keys = if (broadcastParent) broadcast(keys0) else keys0
    val orphans = child
      .select(col(fk))
      .join(keys, col(fk) === col("__pk"), "left_anti")
      .count()
    orphans.toDouble / total
  }

  def evaluate(checkName: String, tableName: String, value: Double,
      threshold: Double, details: String = ""): DqResult =
    DqResult(checkName, tableName, value, threshold,
      if (value <= threshold) "PASS" else "FAIL", details)

  /** Materialize results as the 6-column ledger DataFrame (reference D5). */
  def ledger(spark: SparkSession, results: Seq[DqResult]): DataFrame = {
    import spark.implicits._
    results.toDF().select(
      "check_name", "table_name", "metric_value", "threshold", "status",
      "details")
  }
}
