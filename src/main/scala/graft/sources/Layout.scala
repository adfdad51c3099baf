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
}
