package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned parquet table with keyed MERGE upserts and time
  * travel — the reference's own stated next step
  * (`/root/reference/road_map.md:224` "incremental merge") delivered
  * without a table-format dependency (no Delta/Iceberg jars exist in this
  * environment, and build.sbt may not grow).
  *
  * Layout: `<root>/v=N/` parquet per version, plus a `_LATEST` pointer
  * file whose content is the current version number. Commits write the
  * new version directory fully, then swap the pointer via write-tmp +
  * atomic rename — a reader never observes a half-written version, and a
  * crashed writer leaves the table at the previous version (the orphan
  * `v=N+1` directory is re-used/overwritten by the next committer).
  * Single-writer by design (document stores coordinate externally);
  * readers are lock-free.
  *
  * Scale notes: MERGE is one shuffled left-anti join of base vs update
  * keys plus a union write — O(|base| + |updates|) with the join keyed on
  * the merge key, exactly the shuffle a format-native MERGE performs.
  * Time travel reads prune to a single `v=N` directory at the source.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(root: String) = new Path(root, "_LATEST")

  /** Latest committed version, or -1 if the table does not exist. */
  def latestVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = pointer(root)
    if (!f.exists(p)) -1
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }
  }

  private def commitPointer(spark: SparkSession, root: String,
      version: Int): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"_LATEST.tmp$version")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    // rename is atomic on HDFS-like stores; delete-then-rename for local FS
    if (f.exists(pointer(root))) f.delete(pointer(root), false)
    f.rename(tmp, pointer(root))
  }

  private def commit(spark: SparkSession, root: String, df: DataFrame,
      version: Int): Int = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/v=$version")
    commitPointer(spark, root, version)
    version
  }

  /** Create the table at version 0 (fails if it already exists). */
  def init(df: DataFrame, root: String): Int = {
    val spark = df.sparkSession
    require(latestVersion(spark, root) < 0, s"table already exists: $root")
    commit(spark, root, df, 0)
  }

  /** Read a specific version, or the latest. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Thrown when a concurrent committer advanced the table between a
    * writer's base read and its pointer swap; the loser retries its merge
    * on the new latest version (optimistic concurrency, Delta-style).
    */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Keyed MERGE upsert: rows of `updates` replace base rows with the same
    * key (`whenMatched update all`) and insert otherwise (`whenNotMatched
    * insert all`). Commits and returns the new version.
    *
    * Optimistic concurrency (Delta-style): pass `expectedVersion` — the
    * version the caller read its inputs against — and the commit fails
    * with [[ConcurrentCommitException]] if another writer advanced the
    * table, instead of silently overwriting the winner's rows; the loser
    * re-reads and re-merges. The check runs both up front (cheap fail
    * before the write) and again immediately before the pointer swap
    * (narrowing the race to the swap itself). Without `expectedVersion`
    * the base is the current latest and only the pre-swap check applies.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String], expectedVersion: Option[Int] = None): Int = {
    val latest = latestVersion(spark, root)
    require(latest >= 0, s"no such table: $root")
    val v = expectedVersion.getOrElse(latest)
    if (v != latest)
      throw new ConcurrentCommitException(
        s"base version $v is stale (latest is $latest); re-merge and retry")
    val base = read(spark, root, Some(v))
    // schema evolution (mergeSchema-style): either side may carry columns
    // the other lacks; missing columns fill with null on the short side
    val merged = base.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    merged.write.mode(SaveMode.Overwrite).parquet(s"$root/v=${v + 1}")
    val now = latestVersion(spark, root)
    if (now != v)
      throw new ConcurrentCommitException(
        s"base version $v is stale (latest is $now); re-merge and retry")
    commitPointer(spark, root, v + 1)
    v + 1
  }

  /** Keyed delete: drop base rows whose key appears in `tombstones`.
    * Commits and returns the new version.
    */
  def delete(spark: SparkSession, root: String, tombstones: DataFrame,
      keyCols: Seq[String]): Int = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"no such table: $root")
    val base = read(spark, root, Some(v))
    val remaining = base.join(tombstones.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    commit(spark, root, remaining, v + 1)
  }

  /** One row per committed version: (version, n_rows). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(spark, root)
    (0 to latest).map { v =>
      (v, spark.read.parquet(s"$root/v=$v").count())
    }.toDF("version", "n_rows")
  }

  /** Small-files compaction: rewrite the latest version into `numFiles`
    * files as a NEW version — the data is byte-identical, old versions and
    * time travel are untouched, and the pointer swap keeps readers atomic.
    * Run after many small MERGE batches (each commit writes its own
    * files); at scale, file count — not data volume — is what degrades
    * scan planning.
    */
  def compact(spark: SparkSession, root: String, numFiles: Int = 1): Int = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"no such table: $root")
    commit(spark, root, read(spark, root, Some(v)).coalesce(numFiles), v + 1)
  }

  /** Remove version directories older than `keepVersions` behind latest
    * (time travel window); the pointer and newer versions are untouched.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int): Unit = {
    val f = fs(spark, root)
    val latest = latestVersion(spark, root)
    (0 to latest - keepVersions - 1).foreach { v =>
      val dir = new Path(root, s"v=$v")
      if (f.exists(dir)) f.delete(dir, true)
    }
  }
}
