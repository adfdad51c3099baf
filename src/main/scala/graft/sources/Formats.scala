package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Cross-format source/sink coverage: the same frame written to and read
  * back from each columnar/row format Spark ships in-box (ORC and JSON
  * Lines beside the parquet/CSV the rest of the engine exercises), with
  * a content fingerprint proving the round trip is lossless.
  *
  * Scale notes per format:
  *  - ORC: columnar, splittable, predicate-pushdown-capable — a peer of
  *    parquet at 100 TB; write inherits the frame's partitioning (one
  *    file per task, no coalesce).
  *  - JSON Lines: row-major interchange; ALWAYS read with an explicit
  *    schema — schema inference is a second full scan of the data, which
  *    at 100 TB doubles ingest cost (and can widen types differently
  *    per sample). The helper threads the source schema through.
  *
  * The fingerprint is an order-insensitive sum of per-row xxhash64 over
  * all columns — computed INSIDE Spark for each format so equality is
  * meaningful engine-side; external oracles re-derive the row count and
  * byte totals from the original table.
  */
object Formats {

  /** Order-insensitive whole-frame fingerprint: Σ xxhash64(all columns),
    * summed in decimal(38,0) space — an exact multiset checksum that
    * cannot overflow under ANSI mode even at 10^12 rows (38 digits hold
    * 10^12 · 2^63 with 6 digits to spare).
    */
  def fingerprint(df: DataFrame): java.math.BigDecimal = {
    val cols = df.columns.map(col).toSeq
    val r = df.agg(
      sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("fp")).head()
    if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
  }

  /** Write `df` as `format` under `path`, read it back with `df`'s
    * schema. Supported: "parquet", "orc", "json", "csv".
    */
  def roundTrip(spark: SparkSession, df: DataFrame, path: String,
      format: String): DataFrame = {
    val writer = df.write.format(format).mode("overwrite")
    (if (format == "csv") writer.option("header", "true") else writer)
      .save(path)
    val reader = spark.read.format(format).schema(df.schema)
    // CSV needs its header + embedded-newline contracts pinned (multiLine
    // forfeits intra-file split parallelism — fine for the compat sink,
    // wrong for bulk ingest); JSON/ORC/parquet are self-describing or
    // schema-driven
    (if (format == "csv")
      reader.option("header", "true").option("multiLine", "true")
    else reader).load(path)
  }
}
