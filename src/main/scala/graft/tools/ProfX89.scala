package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Scratch profiler for the bloom-skipping path (not library surface). */
object ProfX89 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val slice = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft-px89")
      .toString + "/tbl"
    val base = slice.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    time("init (write+stats+bloom)") {
      VersionedTable.init(base, root, statsColumns = Seq("l_orderkey"),
        bloomColumns = Seq("l_partkey"))
    }
    val probeKey = time("probe key derivation") {
      slice.groupBy("l_partkey").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c"), col("l_partkey")).limit(1).head().getLong(0)
    }
    time("readPoint agg") {
      VersionedTable.readPoint(spark, root, "l_partkey", probeKey)
        .agg(count(lit(1))).head()
    }
    time("plain read agg") {
      VersionedTable.read(spark, root)
        .filter(col("l_partkey") === probeKey).agg(count(lit(1))).head()
    }
    time("bloomPruneCounts") {
      VersionedTable.bloomPruneCounts(spark, root, "l_partkey", probeKey)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
    spark.stop()
  }
}
// appended sub-profiler
object ProfX89b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val slice = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
    val root = java.nio.file.Files.createTempDirectory("graft-px89b")
      .toString
    time("plain write 8 files") {
      slice.repartitionByRange(8, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.parquet(s"$root/data")
    }
    val df = spark.read.parquet(s"$root/data")
    time("minmax stats agg") {
      df.groupBy(input_file_name().as("f"))
        .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")))
        .collect()
    }
    time("bloom agg") {
      df.groupBy(input_file_name().as("f"))
        .agg(graft.functions.Aggregators.bloomBits(
          xxhash64(col("l_partkey")), 1 << 17, 5))
        .collect()
    }
    time("bloom agg again") {
      df.groupBy(input_file_name().as("f"))
        .agg(graft.functions.Aggregators.bloomBits(
          xxhash64(col("l_partkey")), 1 << 17, 5))
        .collect()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root))
    spark.stop()
  }
}
