package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tooling for the 100 TB path: bucketed tables for
  * exchange-free co-located joins, and date-partitioned layouts for
  * partition-pruned scans. Both are write-once / read-many optimizations —
  * the write pays one shuffle so that every subsequent join or time-sliced
  * read pays none.
  */
object Layout {

  /** Write a DataFrame as a bucketed managed table: `buckets` hash buckets
    * on `key`, sorted within buckets. Two tables bucketed identically on
    * their join key hash-join WITHOUT any Exchange — at 100 TB the shuffle
    * is the join cost, so co-bucketing the big fact tables once is the
    * difference between a network-bound and a local join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // a fresh catalog (e.g. in-memory metastore) doesn't know about a
    // leftover managed location from a previous process — drop both the
    // table and any orphaned directory so Overwrite is truly idempotent
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write date-partitioned parquet: directory layout `dateCol=YYYY-MM-DD/`.
    * Readers filtering on the partition column scan only matching
    * directories (static partition pruning), and joins against a filtered
    * dimension prune dynamically (DPP).
    */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String,
      partitionName: String = "event_date"): Unit =
    df.withColumn(partitionName, col(tsCol).cast("date"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionName)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write range-sorted parquet: rows are range-partitioned then sorted
    * within partitions on `key`, so each output file covers a disjoint key
    * range. Parquet row-group/page statistics then let any reader skip
    * whole files for range predicates on `key` — the single-dimension
    * ordering counterpart of clustering/z-ordering in table formats.
    */
  def writeRangeSorted(df: DataFrame, path: String, key: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** Morton/Z-value of two non-negative integer columns: bits interleave
    * (a in even positions, b in odd), so sorting by the z-value clusters
    * rows that are close in BOTH dimensions. Built from plain shift/and/or
    * column ops — fully codegen'd, no UDF.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 21): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(org.apache.spark.sql.functions.lit(0L)) {
      (acc, i) =>
        acc
          .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
          .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)),
            2 * i + 1))
    }
  }

  /** Write parquet z-ordered on two integer dimensions: range-partition +
    * sort by the interleaved z-value, so each output file covers a small
    * REGION of the (a, b) plane rather than a thin slice of one dimension.
    * Parquet min/max statistics on BOTH columns then stay tight per file,
    * and range predicates on EITHER dimension skip most files — the
    * multi-dimension data-skipping layout single-column sorting can't give
    * (sorting by `a` makes `b`'s per-file spans span the whole domain).
    * At 100 TB this is the difference between scanning a shard and
    * scanning the table for the second-dimension query pattern.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      partitions: Int, bits: Int = 21): Unit = {
    val z = zValue(col(colA), col(colB), bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
