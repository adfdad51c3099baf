package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned parquet table with keyed MERGE upserts and time
  * travel — the reference's own stated next step
  * (`/root/reference/road_map.md:224` "incremental merge") delivered
  * without a table-format dependency (no Delta/Iceberg jars exist in this
  * environment, and build.sbt may not grow).
  *
  * Layout: `<root>/v=N/` parquet per version, plus a `_LATEST` pointer
  * file whose content is the current version number.
  *
  * Commit protocol (all mutators share it):
  *  1. the new version's data is written to a UNIQUELY-NAMED staging
  *     directory — a losing concurrent writer can never clobber a
  *     committed version's files;
  *  2. the base version is re-checked against the pointer; a stale base
  *     throws [[ConcurrentCommitException]] (the stage is cleaned up);
  *  3. the stage renames to `v=N+1` — if that name already exists the
  *     commit conflicts (a racing writer won);
  *  4. the pointer swaps via OVERWRITE rename ([[FileContext]]), which is
  *     atomic on posix/HDFS — readers never observe a missing or
  *     half-written pointer.
  * A crashed writer leaves only a stage directory or an unreferenced
  * `v=N+1`; neither is visible to readers (the pointer still names the
  * previous version) and [[vacuumStages]] clears them. CAS-style
  * `expectedVersion` is the recommended mode under concurrent writers;
  * on filesystems without atomic rename semantics (some object stores)
  * external coordination is still required.
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

  private def statsColsPath(root: String) = new Path(root, "_STATS_COLS")

  private def bloomColsPath(root: String) = new Path(root, "_BLOOM_COLS")

  private def partitionColsPath(root: String) =
    new Path(root, "_PARTITION_COLS")

  /** Partition columns configured at [[init]]; empty for unpartitioned
    * tables.
    */
  def partitionColumns(spark: SparkSession, root: String): Seq[String] =
    readConfig(spark, partitionColsPath(root))

  private def writeConfig(spark: SparkSession, path: Path,
      lines: Seq[String]): Unit = {
    val out = fs(spark, path.toString).create(path, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def writeData(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
  }

  private def readConfig(spark: SparkSession, path: Path): Seq[String] = {
    val f = fs(spark, path.toString)
    if (!f.exists(path)) Nil
    else {
      val in = f.open(path)
      try scala.io.Source.fromInputStream(in).getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** Stat columns configured at [[init]]; empty when the table keeps no
    * file stats.
    */
  def statsColumns(spark: SparkSession, root: String): Seq[String] =
    readConfig(spark, statsColsPath(root))

  /** Columns with per-file Bloom membership indexes configured at
    * [[init]]; empty when none.
    */
  def bloomColumns(spark: SparkSession, root: String): Seq[String] =
    readConfig(spark, bloomColsPath(root))

  /** Compute per-file (min, max, row count) for `cols` over the parquet
    * files in `dataDir` and write them as `<dataDir>/_stats` — an
    * underscore-prefixed directory, so ordinary reads of the version
    * ignore it. One row per data file, keyed by file NAME (the version
    * directory renames from its stage path at commit).
    *
    * This is the file-level min/max index a format-native table (Delta
    * checkpoint, Iceberg manifest) carries; jar-free here, the cost is one
    * aggregation job re-scanning the just-written (page-cache-warm)
    * version instead of harvesting footers during the write.
    */
  /** The data-file path RELATIVE to the version directory (the part after
    * the stage / v=N segment): partitioned layouts nest files under
    * partition directories where bare names collide across partitions,
    * and the stage directory renames away at commit. Strip the KNOWN
    * dataDir prefix literally (scheme-qualified or raw) — a pattern match
    * over the whole path mis-splits when a parent directory itself looks
    * like /v=N/ (e.g. a table rooted under /data/v=2/tbl). The legacy
    * segment regex remains only as a last-resort fallback for a
    * differently-encoded URI. Locating the scheme-free absolute dataDir
    * path inside the (possibly scheme-prefixed) input_file_name is immune
    * to file:/ vs file:/// rendering differences.
    */
  /** The `file` column stores input_file_name()-derived names, which
    * render the on-disk (hive-escaped) path through URI encoding — a
    * literal `%` in a partition directory (`p=a%2Fb` for value "a/b")
    * appears as `%25` (`p=a%252Fb`). These two convert between the
    * index encoding and the on-disk name: identity for names without
    * URI-encoded characters, exact round-trip otherwise.
    */
  private def uriEncodedName(diskRelative: String): String =
    new Path("/" + diskRelative).toUri.getRawPath.stripPrefix("/")

  private def diskRelativeName(indexFile: String): String =
    new java.net.URI(indexFile).getPath

  private def relFileCol(spark: SparkSession, dataDir: String): Column = {
    val dirPath = fs(spark, dataDir).makeQualified(new Path(dataDir))
      .toUri.getPath.stripSuffix("/") + "/"
    val fn = input_file_name()
    val idx = locate(dirPath, fn)
    when(idx > 0,
        fn.substr(idx + lit(dirPath.length), lit(Int.MaxValue)))
      .otherwise(regexp_replace(fn,
        "^.*?/(v=[0-9]+|\\.stage-[^/]+)/", ""))
  }

  /** Build BOTH per-file indexes (`_stats` min/max, `_bloom` membership)
    * in ONE scan of the just-written version — index maintenance is a
    * full-version read, so fusing the aggregations halves its IO at any
    * scale. Either list may be empty; each sidecar only materializes for
    * the columns actually present in this version's schema.
    */
  private def writeIndexes(spark: SparkSession, dataDir: String,
      statCols: Seq[String], bloomCols: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType): Unit = {
    // the caller just WROTE dataDir from a frame of this schema, so the
    // read-back supplies it and skips the footer-inference job every
    // commit otherwise pays (partition columns parse from the hive dirs
    // and cast to their declared types, same as inference)
    val df = spark.read.schema(dataSchema).parquet(dataDir)
    val sPresent = statCols.filter(df.columns.contains)
    val bPresent = bloomCols.filter(df.columns.contains)
    if (sPresent.isEmpty && bPresent.isEmpty) return
    val statAggs =
      if (sPresent.isEmpty) Nil
      else count(lit(1)).as("n_rows") +: sPresent.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val bloomAggs = bPresent.map(c =>
      graft.functions.Aggregators.bloomBits(
        xxhash64(col(c)), BloomNumBits, BloomNumHashes).as(s"bloom_$c"))
    val aggs = statAggs ++ bloomAggs
    val indexed = df.groupBy(relFileCol(spark, dataDir).as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
    if (bPresent.isEmpty) {
      // single sidecar: write straight from the aggregation (one job)
      indexed.write.mode(SaveMode.Overwrite).parquet(s"$dataDir/_stats")
    } else if (sPresent.isEmpty) {
      indexed.write.mode(SaveMode.Overwrite).parquet(s"$dataDir/_bloom")
    } else {
      // both: file-count-sized — persist the one aggregation (one scan
      // of the version), project each sidecar from the cache
      val statNames =
        "n_rows" +: sPresent.flatMap(c => Seq(s"min_$c", s"max_$c"))
      indexed.persist()
      try {
        indexed.select(("file" +: statNames).map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(s"$dataDir/_stats")
        indexed.select(("file" +: bPresent.map(c => s"bloom_$c"))
          .map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(s"$dataDir/_bloom")
      } finally indexed.unpersist()
    }
  }

  /** Bloom sidecar geometry: 2^17 bits (16 KB) x 5 probes per (file,
    * column) — ~1% fpp at 10^4 distinct values per file, still useful an
    * order of magnitude past that. A thousand-file version carries a
    * ~16 MB sidecar — the same driver-read class as a format-native
    * manifest/checkpoint.
    */
  private val BloomNumBits = 1 << 17
  private val BloomNumHashes = 5

  // `_bloom` sidecar: per-(file, column) Bloom bit arrays over xxhash64
  // of the column — the membership index for POINT lookups on columns
  // where min/max is structurally useless (any column uncorrelated with
  // the clustering key spans its full range in every file). Published
  // atomically with the data via the stage rename, like `_stats`; built
  // by [[writeIndexes]] in the same scan.

  /** Per-file stats of a version (file, n_rows, min_/max_ per configured
    * column). Fails if the table keeps no stats.
    */
  def fileStats(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    graft.Tables.readImmutable(spark, s"$root/v=$v/_stats")
  }

  /** Stats of a version usable for pruning on `column`: Some(stats) only
    * when the version's `_stats` dir exists AND carries `min_`/`max_` for
    * the column. The table-level config alone is not enough: schema
    * evolution through [[merge]] legitimately commits versions lacking a
    * configured stats column (writeFileStats then writes a subset — or,
    * with no configured column present, nothing at all), and readers must
    * degrade to a plain filtered read, not throw.
    */
  private def pruningStats(spark: SparkSession, root: String, v: Int,
      column: String): Option[DataFrame] = {
    val statsPath = new Path(s"$root/v=$v/_stats")
    if (!fs(spark, root).exists(statsPath)) return None
    // the sidecar is committed with (and as immutable as) its version dir
    val st = graft.Tables.readImmutable(spark, statsPath.toString)
    if (st.columns.contains(s"min_$column") &&
      st.columns.contains(s"max_$column")) Some(st) else None
  }

  /** Directory-prefix of a static partition predicate over a PREFIX of
    * the configured partition columns, in hive layout (`k1=v1/k2=v2/`).
    * Values render through Spark's own hive partition-path escaping
    * (`ExternalCatalogUtils.escapePathName` — the writer side escapes
    * `/`, `:`, `%`, ... as %XX, so a raw toString prefix would match NO
    * files for any value needing escapes and silently return an empty
    * result for a populated partition); None when `partitionValues`
    * names columns out of prefix order or not configured — static
    * pruning then degrades to row filtering.
    */
  private def partitionPrefix(spark: SparkSession, root: String,
      partitionValues: Seq[(String, Any)]): Option[String] = {
    if (partitionValues.isEmpty) return Some("")
    val configured = partitionColumns(spark, root)
    val keys = partitionValues.map(_._1)
    if (keys != configured.take(keys.length)) None
    else Some(partitionValues.map { case (k, v) =>
      val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(String.valueOf(v))
      // the file column is input_file_name()-derived, so the prefix must
      // carry the URI layer's encoding on top of the hive escaping
      s"${uriEncodedName(s"$k=$esc")}/"
    }.mkString)
  }

  /** Data-skipping range read: `column BETWEEN lower AND upper` over a
    * version, scanning ONLY the files whose [min, max] span intersects
    * the range. `partitionValues` composes STATIC PARTITION PRUNING with
    * the stats index on partitioned layouts: equality values over a
    * prefix of the configured partition columns drop every file outside
    * their directories BEFORE the stats test — the two prune
    * independently (directory for the partition key, min/max for the
    * clustered key), so a range query on a partitioned table scans the
    * intersection. Rows are additionally filtered by both predicates, so
    * results never depend on pruning. All-null files (null min/max) are
    * skipped too — a range predicate cannot match them.
    *
    * Falls back to a plain filtered read when the version has no usable
    * stats for `column` — same result, no skipping.
    */
  def readRange(spark: SparkSession, root: String, column: String,
      lower: Any, upper: Any, version: Option[Int] = None,
      partitionValues: Seq[(String, Any)] = Nil): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    val pred = partitionValues.foldLeft(
      col(column).between(lit(lower), lit(upper))) {
      case (p, (k, pv)) => p && col(k) === lit(pv)
    }
    val st = if (statsColumns(spark, root).contains(column))
      pruningStats(spark, root, v, column) else None
    if (st.isEmpty) return read(spark, root, Some(v)).filter(pred)
    val prefix = partitionPrefix(spark, root, partitionValues)
    val files = st.get
      .filter(col(s"max_$column") >= lit(lower) &&
        col(s"min_$column") <= lit(upper))
      .filter(prefix match {
        case Some(p) if p.nonEmpty => col("file").startsWith(p)
        case _ => lit(true)
      })
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      read(spark, root, Some(v)).filter(lit(false))
    else
      // basePath keeps partition-directory columns derivable when reading
      // leaf files of a partitioned layout; harmless otherwise. The
      // version's cached schema rides along so the pruned read skips
      // re-inferring footers it is about to open anyway.
      spark.read.option("basePath", s"$root/v=$v")
        .schema(read(spark, root, Some(v)).schema)
        .parquet(files.map(f =>
          s"$root/v=$v/${diskRelativeName(f)}").toSeq: _*)
        .filter(pred)
  }

  /** Data-file names (version-relative) whose Bloom bits might contain
    * `value` on `column`, or None when the version keeps no usable bloom
    * for the column (degrade to a plain read, the [[pruningStats]]
    * discipline). The probe hash comes from a one-row LOCAL Spark job so
    * build and probe share Spark's own xxhash64 bit-for-bit — no
    * driver-side reimplementation to drift. The sidecar is file-count
    * sized (16 KB per file-column), the same driver-read class as a
    * format-native manifest.
    */
  private def bloomCandidates(spark: SparkSession, root: String, v: Int,
      column: String, value: Any): Option[Seq[String]] = {
    if (!bloomColumns(spark, root).contains(column)) return None
    val bloomPath = new Path(s"$root/v=$v/_bloom")
    if (!fs(spark, root).exists(bloomPath)) return None
    val bl = graft.Tables.readImmutable(spark, bloomPath.toString)
    if (!bl.columns.contains(s"bloom_$column")) return None
    // hash the probe AT THE COLUMN'S TYPE: xxhash64 is type-sensitive
    // (an Int literal against a bigint column hashes differently), and a
    // wrong-typed probe would yield a FALSE NEGATIVE — the one error
    // class a bloom index must never produce
    val colType = read(spark, root, Some(v)).schema(column).dataType
    val h = spark.range(1)
      .select(xxhash64(lit(value).cast(colType)).as("h"))
      .head().getLong(0)
    val files = bl.select(col("file"), col(s"bloom_$column"))
      .collect()
      .filter { r =>
        graft.functions.Aggregators.BloomBits.contains(
          r.getSeq[Long](1).toArray, h, BloomNumHashes)
      }
      .map(_.getString(0)).toSeq
    Some(files)
  }

  /** Point lookup `column == value` over a version, skipping every data
    * file whose Bloom index proves the value absent. Composes with the
    * min/max stats index when the column carries one too (candidates
    * intersect); degrades to a plain filtered read when neither exists.
    * False positives only widen the file list — the exact predicate
    * re-filters — so results always equal the plain read.
    */
  def readPoint(spark: SparkSession, root: String, column: String,
      value: Any, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    val pred = col(column) === lit(value)
    val fromBloom = bloomCandidates(spark, root, v, column, value)
    val fromStats =
      if (statsColumns(spark, root).contains(column))
        pruningStats(spark, root, v, column).map(_.filter(
          col(s"max_$column") >= lit(value) &&
            col(s"min_$column") <= lit(value))
          .select("file").collect().map(_.getString(0)).toSeq)
      else None
    val files = (fromBloom, fromStats) match {
      case (None, None) => return read(spark, root, Some(v)).filter(pred)
      case (Some(b), Some(s)) => b.intersect(s)
      case (Some(b), None) => b
      case (None, Some(s)) => s
    }
    if (files.isEmpty) read(spark, root, Some(v)).filter(lit(false))
    else spark.read.option("basePath", s"$root/v=$v")
      .schema(read(spark, root, Some(v)).schema)
      .parquet(files.map(f => s"$root/v=$v/${diskRelativeName(f)}"): _*)
      .filter(pred)
  }

  /** (files scanned, files total) for a [[readPoint]] lookup — the
    * bloom-skip observability twin of [[pruneCounts]]. (total, total)
    * when no index is usable.
    */
  def bloomPruneCounts(spark: SparkSession, root: String, column: String,
      value: Any, version: Option[Int] = None): (Long, Long) = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    val total = read(spark, root, Some(v)).inputFiles.length.toLong
    bloomCandidates(spark, root, v, column, value) match {
      case Some(files) => (files.length.toLong, total)
      case None => (total, total)
    }
  }

  /** (files scanned, files total) for the range over a version — the
    * skip-ratio observability hook readers alert on. For a column without
    * configured stats the answer mirrors [[readRange]]'s no-skip
    * fallback: every data file scans, so (total, total).
    */
  def pruneCounts(spark: SparkSession, root: String, column: String,
      lower: Any, upper: Any, version: Option[Int] = None,
      partitionValues: Seq[(String, Any)] = Nil): (Long, Long) = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    val stOpt = if (statsColumns(spark, root).contains(column))
      pruningStats(spark, root, v, column) else None
    if (stOpt.isEmpty) {
      val total = read(spark, root, Some(v)).inputFiles.length.toLong
      return (total, total)
    }
    val st = stOpt.get
    val prefixPred = partitionPrefix(spark, root, partitionValues) match {
      case Some(p) if p.nonEmpty => col("file").startsWith(p)
      case _ => lit(true)
    }
    val r = st.agg(count(lit(1)).as("total"),
      sum((col(s"max_$column") >= lit(lower) &&
        col(s"min_$column") <= lit(upper) && prefixPred).cast("long"))
        .as("kept"))
      .head()
    (Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L), r.getLong(0))
  }

  /** Range-cluster the latest version on `key` as a new version (the
    * jar-free analogue of OPTIMIZE ZORDER for one dimension): after
    * mutations scramble file spans, this restores tight per-file min/max
    * and with them the skip ratio. Data is row-identical; time travel and
    * the commit protocol are untouched.
    */
  def recluster(spark: SparkSession, root: String, key: String,
      partitions: Int): Int = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"no such table: $root")
    commitNext(spark, root,
      read(spark, root, Some(v))
        .repartitionByRange(partitions, col(key))
        .sortWithinPartitions(key), v)
  }

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

  /** Thrown when a concurrent committer advanced the table between a
    * writer's base read and its commit; the loser retries against the new
    * latest version (optimistic concurrency, Delta-style).
    */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Atomic pointer swap: write a tmp pointer, rename over `_LATEST` with
    * OVERWRITE — no delete-then-rename window where readers see no table.
    */
  private def commitPointer(spark: SparkSession, root: String,
      version: Int): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"_LATEST.tmp$version")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, pointer(root), Options.Rename.OVERWRITE)
  }

  /** Stage-write `df` as version `baseV + 1` and commit it, enforcing
    * that `baseV` is still the latest at commit time.
    */
  private def commitNext(spark: SparkSession, root: String, df: DataFrame,
      baseV: Int): Int = {
    val next = baseV + 1
    val f = fs(spark, root)
    val stage = new Path(root,
      s".stage-v$next-${java.util.UUID.randomUUID()}")
    writeData(df, stage.toString, partitionColumns(spark, root))
    // stats + blooms ride the stage directory into the commit rename:
    // they are published atomically with the data files they index
    writeIndexes(spark, stage.toString,
      statsColumns(spark, root), bloomColumns(spark, root), df.schema)
    def conflict(now: Int): Nothing = {
      f.delete(stage, true)
      throw new ConcurrentCommitException(
        s"base version $baseV is stale (latest is $now); retry on latest")
    }
    val now = latestVersion(spark, root)
    if (now != baseV) conflict(now)
    val dest = new Path(root, s"v=$next")
    if (f.exists(dest)) {
      // dest exists but the pointer still says baseV. TWO states share
      // this observation: (a) a crashed writer's unreferenced leftover
      // (renamed, died before the pointer swap) — safe to reclaim; (b) a
      // LIVE competitor inside its own rename->pointer window — deleting
      // its directory would destroy a version whose pointer swap is about
      // to land (both commits would then "succeed" with one writer's rows
      // gone). Disambiguate by age: the rename->pointer window is
      // sub-second (the stage's last file writes land just before the
      // rename, so dir mtime ~ rename time), so a YOUNG dest is treated
      // as a live competitor and this commit conflicts; only stale
      // leftovers are reclaimed. Residual assumption, documented: a live
      // writer never pauses longer than the grace window between its
      // rename and its pointer swap. "Now" is read from the FILESYSTEM
      // clock (mtime of a freshly-touched probe file), not the driver's
      // System.currentTimeMillis — a driver clock ahead of the storage
      // clock by more than the grace window would otherwise age a live
      // competitor's young directory into "stale" and re-open the
      // delete-a-live-writer lost-write race.
      val probe = new Path(root,
        s".clockprobe-${java.util.UUID.randomUUID()}")
      f.create(probe, true).close()
      val fsNow = try f.getFileStatus(probe).getModificationTime
        finally f.delete(probe, false)
      val ageMs = fsNow - f.getFileStatus(dest).getModificationTime
      if (ageMs < orphanGraceMs) conflict(latestVersion(spark, root))
      f.delete(dest, true)
    }
    if (!f.rename(stage, dest)) conflict(latestVersion(spark, root))
    commitPointer(spark, root, next)
    next
  }

  /** Age below which an unreferenced v=next directory is presumed to be
    * a LIVE concurrent writer's not-yet-pointed commit rather than a
    * crashed writer's leftover — see the reclamation note in commitNext.
    */
  private val orphanGraceMs: Long = 60000L

  /** Create the table at version 0 (fails if it already exists). Pass
    * `statsColumns` to maintain per-file min/max skipping stats, and/or
    * `partitionBy` to hive-partition every version's layout, on every
    * version this table ever commits (see [[readRange]]). Partition
    * pruning on reads is Spark-native: filters on partition columns never
    * touch excluded directories, and join queries get dynamic partition
    * pruning from Catalyst unchanged.
    */
  def init(df: DataFrame, root: String,
      statsColumns: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      bloomColumns: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    require(latestVersion(spark, root) < 0, s"table already exists: $root")
    if (statsColumns.nonEmpty)
      writeConfig(spark, statsColsPath(root), statsColumns)
    if (partitionBy.nonEmpty)
      writeConfig(spark, partitionColsPath(root), partitionBy)
    if (bloomColumns.nonEmpty)
      writeConfig(spark, bloomColsPath(root), bloomColumns)
    writeData(df, s"$root/v=0", partitionBy)
    writeIndexes(spark, s"$root/v=0", statsColumns, bloomColumns, df.schema)
    commitPointer(spark, root, 0)
    0
  }

  /** Read a specific version, or the latest. A committed version
    * directory is immutable by the commit protocol (mutation = a new
    * version; vacuum deletes, never rewrites), so the read goes through
    * the session schema cache — repeat reads of a version skip the
    * footer-inference job.
    */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(spark, root))
    require(v >= 0, s"no such table: $root")
    graft.Tables.readImmutable(spark, s"$root/v=$v")
  }

  /** Keyed MERGE upsert: rows of `updates` replace base rows with the same
    * key (`whenMatched update all`) and insert otherwise (`whenNotMatched
    * insert all`). Commits and returns the new version.
    *
    * Pass `expectedVersion` (the version the caller read its inputs
    * against) for CAS semantics: a stale base throws
    * [[ConcurrentCommitException]] before any data is written. Without it
    * the base is the current latest; the shared commit protocol still
    * re-checks staleness before publishing.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
      keyCols: Seq[String], expectedVersion: Option[Int] = None,
      requireUniqueKeys: Boolean = false): Int = {
    val latest = latestVersion(spark, root)
    require(latest >= 0, s"no such table: $root")
    val v = expectedVersion.getOrElse(latest)
    if (v != latest)
      throw new ConcurrentCommitException(
        s"base version $v is stale (latest is $latest); retry on latest")
    val base = read(spark, root, Some(v))
    // DEFAULT semantics are GROUP-REPLACE on multisets: every base row
    // sharing a key with `updates` is replaced by ALL the update rows of
    // that key — well-defined when neither side is key-unique (the
    // synthetic lineitem is not, and x49's oracle pins this contract).
    // `requireUniqueKeys = true` switches to Delta/Iceberg MERGE error
    // semantics — multiple update rows for one key fail loudly — for
    // consumers whose math NEEDS a keyed table (the CDC aggregate sink:
    // a change feed over duplicate keys multiplies rows through its
    // full-outer key join). One bounded aggregation over the updates
    // side; collect is limit(1)-bounded (at most one witness row).
    if (requireUniqueKeys) {
      val dup = updates.groupBy(keyCols.map(col): _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"merge: updates contain multiple rows for key " +
          s"${keyCols.mkString("(", ",", ")")} = " +
          s"${keyCols.map(dup.head.getAs[Any]).mkString("(", ",", ")")}" +
          " — collapse the updates to one row per key first (MERGE on " +
          "a multi-match is an error, as in Delta/Iceberg)")
    }
    // schema evolution (mergeSchema-style): either side may carry columns
    // the other lacks; missing columns fill with null on the short side
    val merged = base.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    commitNext(spark, root, merged, v)
  }

  /** Keyed delete: drop base rows whose key appears in `tombstones`.
    * Commits and returns the new version; same CAS semantics as [[merge]].
    */
  def delete(spark: SparkSession, root: String, tombstones: DataFrame,
      keyCols: Seq[String], expectedVersion: Option[Int] = None): Int = {
    val latest = latestVersion(spark, root)
    require(latest >= 0, s"no such table: $root")
    val v = expectedVersion.getOrElse(latest)
    if (v != latest)
      throw new ConcurrentCommitException(
        s"base version $v is stale (latest is $latest); retry on latest")
    val base = read(spark, root, Some(v))
    val remaining = base.join(tombstones.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    commitNext(spark, root, remaining, v)
  }

  /** Change-data feed between two committed versions (the Delta CDF /
    * Iceberg changelog shape, jar-free): one row per changed record with
    * `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage — updates emit BOTH images, so downstream
    * aggregate-maintenance consumers can retract the old contribution
    * and add the new one without re-reading the base.
    *
    * Semantics: records are identified by `keyCols`; a key present only
    * in `toVersion` is an insert, only in `fromVersion` a delete, and
    * present in both with any non-key column differing (null-safely) an
    * update. Unchanged rows emit nothing. A NULL-keyed record never
    * join-matches its counterpart (standard SQL join semantics), so it
    * surfaces as a delete + insert pair rather than an update — the same
    * rendering Delta's CDF gives un-joinable keys.
    *
    * Scale shape: ONE full-outer shuffle join keyed on the record key —
    * both sides are version snapshots read directly from their own data
    * dirs (partition pruning and stats skipping compose upstream of the
    * join via the usual readers); the update pre/post pair expands
    * LOCALLY from the joined row (no second pass, no window). Change
    * volume, not table volume, flows out.
    */
  def changeFeed(spark: SparkSession, root: String, fromVersion: Int,
      toVersion: Int, keyCols: Seq[String]): DataFrame = {
    require(fromVersion != toVersion, "versions must differ")
    import org.apache.spark.sql.functions._
    val before = read(spark, root, Some(fromVersion))
    val after = read(spark, root, Some(toVersion))
    require(before.columns.sameElements(after.columns),
      "change feed across schema evolution is not supported; " +
        "read both versions and diff explicitly")
    val dataCols = before.columns.filterNot(keyCols.contains).toSeq
    val b = before.select(struct(before.columns.map(col): _*).as("__b"))
      .select(col("__b") +: keyCols.map(k => col(s"__b.$k").as(k)): _*)
    val a = after.select(struct(after.columns.map(col): _*).as("__a"))
      .select(col("__a") +: keyCols.map(k => col(s"__a.$k").as(k)): _*)
    val joined = b.join(a, keyCols, "full_outer")
    val changed = joined.filter(!(col("__b") <=> col("__a")))
    // classify + expand: inserts/deletes carry their one image; updates
    // explode into (preimage, postimage) locally
    val images = changed.select(explode(when(col("__b").isNull,
        array(struct(lit("insert").as("__t"), col("__a").as("__row"))))
      .when(col("__a").isNull,
        array(struct(lit("delete").as("__t"), col("__b").as("__row"))))
      .otherwise(array(
        struct(lit("update_preimage").as("__t"), col("__b").as("__row")),
        struct(lit("update_postimage").as("__t"), col("__a").as("__row")))))
      .as("__c"))
    images.select(col("__c.__t").as("_change_type") +:
      (keyCols ++ dataCols).map(c => col(s"__c.__row.$c").as(c)): _*)
  }

  /** SCD Type-2 history materialization over the table's surviving
    * version range: one row per maximal run of consecutive versions in
    * which a key held the SAME image — `(keyCols*, dataCols*,
    * ver_from, ver_to)` with `ver_from` the first and `ver_to` the last
    * version of the run, both inclusive; `ver_to` is NULL while the
    * image is still current at the latest version. A version where the
    * key is ABSENT closes its run (delete), and a later reappearance
    * opens a new one (re-insert) — presence gaps split runs, so the
    * full lifecycle (insert → updates → delete → re-insert) reads off
    * the intervals directly. This is the batch CDC→SCD2 backfill path:
    * [[changeFeed]] maintains a downstream dimension incrementally per
    * commit; this reconstructs the whole dimension from the retained
    * versions in one pass (Delta's CDF + MERGE-driven SCD2 pattern,
    * jar-free).
    *
    * Scale shape: one scan per retained version (inherent — the history
    * IS those snapshots) into a union, then ONE shuffle on the record
    * key for the run-detection window; the run-end window partitions on
    * (key, run), which the key partitioning already clusters, so
    * Catalyst adds no second exchange. Output volume is change volume
    * (distinct images per key), not table-x-versions volume. Bound the
    * scan side with [[vacuum]]'s retention before backfilling a
    * long-lived table.
    *
    * Refuses a NON-consecutive surviving range loudly: vacuum reclaims
    * a prefix horizon, so a hole means a concurrent vacuum raced the
    * listing — silently treating the hole as a delete epoch would
    * fabricate history.
    */
  def scd2History(spark: SparkSession, root: String,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val latest = latestVersion(spark, root)
    require(latest >= 0, s"no such table: $root")
    val f = fs(spark, root)
    val versions = (0 to latest)
      .filter(v => f.exists(new Path(root, s"v=$v")))
    require(versions == (versions.head to latest),
      s"scd2History needs a consecutive surviving version range, got " +
        s"${versions.mkString(",")} — a hole means a vacuum raced this " +
        "listing; retry")
    val frames = versions.map(v => read(spark, root, Some(v)))
    require(frames.forall(_.columns.sameElements(frames.head.columns)),
      "scd2History across schema evolution is not supported; read the " +
        "versions and diff explicitly")
    val dataCols = frames.head.columns.filterNot(keyCols.contains).toSeq
    val all = frames.zip(versions).map { case (df, v) =>
      df.withColumn("_v", lit(v)) }.reduce(_.unionByName(_))
    val img = struct(dataCols.map(col): _*)
    val wk = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_v"))
    // a run STARTS where the previous version had no row for the key
    // (first appearance or re-insert after delete) or a different image
    val marked = all
      .withColumn("__start",
        when(lag(col("_v"), 1).over(wk).isNull
          .or(lag(col("_v"), 1).over(wk) =!= col("_v") - 1)
          .or(!(lag(img, 1).over(wk) <=> img)), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__start")).over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wr = Window.partitionBy((keyCols.map(col) :+ col("__run")): _*)
    marked
      .withColumn("__end_v", max(col("_v")).over(wr))
      .filter(col("__start") === 1L)
      .select((keyCols ++ dataCols).map(col) ++ Seq(
        col("_v").as("ver_from"),
        when(col("__end_v") === latest, lit(null).cast("int"))
          .otherwise(col("__end_v")).as("ver_to")): _*)
  }

  /** One row per SURVIVING version: (version, n_rows). Versions behind
    * the vacuum horizon are simply absent — listing what exists instead
    * of assuming 0..latest, so history after a vacuum reports the
    * time-travel window rather than throwing on the first reclaimed
    * path.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(spark, root)
    val f = fs(spark, root)
    (0 to latest)
      .filter(v => f.exists(new Path(root, s"v=$v")))
      .map { v =>
        (v, read(spark, root, Some(v)).count())
      }.toDF("version", "n_rows")
  }

  /** Small-files compaction: rewrite the latest version into `numFiles`
    * files as a NEW version — the data is byte-identical, old versions and
    * time travel are untouched, and the commit protocol (staging +
    * staleness check + pointer swap) keeps readers atomic and concurrent
    * merges un-clobbered.
    */
  def compact(spark: SparkSession, root: String, numFiles: Int = 1): Int = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"no such table: $root")
    commitNext(spark, root, read(spark, root, Some(v)).coalesce(numFiles), v)
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

  /** Remove abandoned staging directories left by crashed writers. */
  def vacuumStages(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (f.exists(rootPath))
      f.listStatus(rootPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage-"))
        .foreach(s => f.delete(s.getPath, true))
  }
}
