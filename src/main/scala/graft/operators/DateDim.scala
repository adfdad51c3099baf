package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived calendar dimension (reference D10,
  * `/root/reference/src/pipeline.py:142-187`, spec `README_CANDIDATO.md:68`):
  * union-distinct the date columns of the fact tables, then derive
  * `date_id (yyyyMMdd int), date, year, month, month_name, day, day_of_week,
  * is_weekend` (weekend = Sunday/Saturday, `dayofweek in (1,7)`).
  *
  * Scale: the distinct is a shuffle over *dates only* (column-pruned before
  * the union), cardinality bounded by the calendar — thousands of rows no
  * matter how large the facts are. The global sort on the result is trivial.
  */
object DateDim {

  /** Build from one date column per source frame; columns are cast to DateType. */
  def fromDateColumns(sources: Seq[(DataFrame, String)]): DataFrame = {
    require(sources.nonEmpty, "DateDim needs at least one (frame, column)")
    val dates = sources
      .map { case (df, c) => df.select(col(c).cast("date").as("date")) }
      .reduce(_.union(_))
      .filter(col("date").isNotNull)
      .distinct()
    attributes(dates, col("date"))
  }

  /** Attach the calendar attribute columns to a frame of distinct dates. */
  def attributes(dates: DataFrame, d: Column): DataFrame =
    dates
      .withColumn("date_id", date_format(d, "yyyyMMdd").cast("int"))
      .withColumn("year", year(d))
      .withColumn("month", month(d))
      .withColumn("month_name", date_format(d, "MMMM"))
      .withColumn("day", dayofmonth(d))
      .withColumn("day_of_week", date_format(d, "E"))
      .withColumn("is_weekend", dayofweek(d).isin(1, 7))
      .select("date_id", "date", "year", "month", "month_name", "day",
        "day_of_week", "is_weekend")
      .orderBy("date")
}
