package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch profiler for the incremental-dedup fold phases (not library
  * surface). Times each per-fold job — survivor materialization, the three
  * state writes — for the x42 query shape, alternating repetitions in one
  * JVM so host drift can't masquerade as a difference.
  */
object ProfX42 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // the r9 guard shape, inlined: full recount of band history per fold,
    // ok-bucket semi-joins on both candidate sides, no counts table
    def foldOld(batch: DataFrame, prefix: String, buckets: Int): Unit = {
      val bandsT = s"${prefix}_bands"
      val shinglesT = s"${prefix}_shingles"
      val (batchSigs, batchBanded) =
        Dedup.bandBatch(batch, "text", "doc_id", 3, 64, 16, 42L)
      batchSigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hasState = spark.catalog.tableExists(bandsT)
      val maxBucketSize = 1000
      val allBanded =
        if (!hasState) batchBanded
        else spark.table(bandsT).unionByName(batchBanded)
      val okBuckets = allBanded.groupBy("__bkey")
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") <= maxBucketSize)
        .select("__bkey")
      val batchB = batchBanded.join(okBuckets, Seq("__bkey"), "left_semi")
      val histPairs =
        if (!hasState) batchBanded.limit(0)
          .select(col("id").as("id_a"), col("id").as("id_b")).limit(0)
        else spark.table(bandsT)
          .join(okBuckets, Seq("__bkey"), "left_semi")
          .join(batchB.withColumnRenamed("id", "id_b"), Seq("__bkey"))
          .filter(col("id") < col("id_b"))
          .select(col("id").as("id_a"), col("id_b"))
      val selfPairs = batchB
        .join(batchB.withColumnRenamed("id", "id_b"), Seq("__bkey"))
        .filter(col("id") < col("id_b"))
        .select(col("id").as("id_a"), col("id_b"))
      val pairIds = histPairs.unionByName(selfPairs)
        .dropDuplicates("id_a", "id_b")
      val shAll =
        if (!hasState) batchSigs.select(col("id"), col("__sh"))
        else spark.table(shinglesT).select(col("id"), col("__sh"))
          .unionByName(batchSigs.select(col("id"), col("__sh")))
      val shA = shAll.select(col("id").as("id_a"), col("__sh").as("__sh_a"))
      val shB = batchSigs.select(col("id").as("id_b"), col("__sh").as("__sh_b"))
      val inter = size(array_intersect(col("__sh_a"), col("__sh_b")))
      val union = size(col("__sh_a")) + size(col("__sh_b")) - inter
      val losers = pairIds
        .join(shA, Seq("id_a")).join(shB, Seq("id_b"))
        .filter(when(union > 0, inter.cast("double") / union)
          .otherwise(lit(0.0)) >= 0.8)
        .select(col("id_b").as("id"))
        .distinct()
      val survivors = batch.join(
        losers.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("OLD survivors.count")(survivors.count())
      if (!hasState) {
        time("OLD write bands")(batchBanded.write.bucketBy(buckets, "__bkey")
          .format("parquet").saveAsTable(bandsT))
        time("OLD write shingles")(batchSigs.select(col("id"), col("__sh"))
          .write.bucketBy(buckets, "id").format("parquet")
          .saveAsTable(shinglesT))
      } else {
        time("OLD append bands")(batchBanded.write.mode("append")
          .bucketBy(buckets, "__bkey").format("parquet").saveAsTable(bandsT))
        time("OLD append shingles")(batchSigs.select(col("id"), col("__sh"))
          .write.mode("append").bucketBy(buckets, "id").format("parquet")
          .saveAsTable(shinglesT))
      }
      batchSigs.unpersist()
      survivors.unpersist()
    }

    // the real library fold (counts-table guard + concurrent state writes)
    def fold(batch: DataFrame, prefix: String, buckets: Int): Unit = {
      val survivors = time("NEW fold (library)")(
        Dedup.incrementalMinhashDedup(batch, prefix, "text", "doc_id",
          threshold = 0.8, buckets = buckets))
      survivors.unpersist()
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 999)
    (1 to reps).foreach { r =>
      Seq("new", "old").foreach { variant =>
        System.err.println(s"[prof] === rep $r ($variant) ===")
        val prefix = s"profx42_${variant}_$r"
        Dedup.dropIncrementalDedupState(spark, prefix)
        val t0 = System.nanoTime()
        Seq((0L, 499L), (499L, 999L)).foreach { case (lo, hi) =>
          val b = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          if (variant == "new") fold(b, prefix, 4)
          else foldOld(b, prefix, 4)
        }
        System.err.println(
          f"[prof] TOTAL $variant ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        Dedup.dropIncrementalDedupState(spark, prefix)
      }
    }
    spark.stop()
  }
}
