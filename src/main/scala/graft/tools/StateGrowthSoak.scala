package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Many-fold longevity soak for the incremental-dedup state protocol
  * (`Dedup.incrementalMinhashDedup`): every committed gate so far proves
  * the protocol over a FEW folds; this main runs 20+ consecutive tagged
  * folds of a real corpus and asserts the properties that only show up
  * at realistic cadence:
  *
  *  - per-fold wall time stays flat-ish as history accumulates (the
  *    candidate join is bucket-pruned against state, so fold cost must
  *    not grow superlinearly with fold count);
  *  - the `_bucket_counts` state table's FILE COUNT stays bounded —
  *    compaction (trigger: > buckets*8 delta files; plus the
  *    one-generation retention window) must actually reclaim, or the
  *    occupancy read degrades with every fold;
  *  - bands/shingles grow by exactly `buckets` files per fold (they ARE
  *    the history — growth is linear by design, and the soak asserts
  *    that design instead of eyeballing it);
  *  - after all folds, a tag-matched replay of the LAST fold returns the
  *    pinned verdict without appending any state (exactly-once across
  *    the whole lineage, not just across one fold).
  *
  * Emits one JSON artifact (arg 1, default target/soak_state.json) with
  * per-fold seconds, per-fold per-table file counts, per-fold survivor
  * counts, a per-fold host calibration probe (the Bench probe shape, so
  * a degraded-host phase is visible in-artifact instead of narrated),
  * and head commit + dirty flag. Exits non-zero on any violated bound.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /tmp/sfdata/sf1),
  * SPARK_GRAFT_FOLDS (default 20), SPARK_GRAFT_CPUS (default 32).
  */
object StateGrowthSoak {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val outFile = args.headOption.getOrElse("target/soak_state.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfdata/sf1")
    val nFolds = sys.env.getOrElse("SPARK_GRAFT_FOLDS", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = 4
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-state-soak").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-state-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select((col("id") % 99991L).as("k"), xxhash64(col("id")).as("h"))
        .groupBy("k").agg(sum("h").as("s")).count()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate(); calibrate() // probe JIT warmup stays out of the series

    def sh(cmd: Seq[String]): Option[String] =
      try {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
          .mkString.trim
        if (p.waitFor() == 0) Some(out) else None
      } catch { case _: Throwable => None }
    val headCommit = sh(Seq("git", "rev-parse", "HEAD")).getOrElse("unknown")
    val gitDirty = sh(Seq("git", "status", "--porcelain"))
      .map(_.nonEmpty).getOrElse(false)

    val prefix = "soakstate"
    def partFiles(table: String): Int = {
      val loc = new org.apache.hadoop.fs.Path(warehouse, table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) 0
      else fs.listStatus(loc).count(_.getPath.getName.startsWith("part-"))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    // id-ordered fold boundaries (the serial-folds contract wants ids
    // monotone across batches): exact quantile cuts over doc_id
    val cuts = docs.stat.approxQuantile("doc_id",
      (0 to nFolds).map(_.toDouble / nFolds).toArray, 0.0)
      .map(_.toLong)
    System.err.println(
      s"[state-soak] $total docs, $nFolds folds, warehouse=$warehouse")

    graft.operators.Dedup.dropIncrementalDedupState(spark, prefix)
    // in-window stall meter (graft.tools.StallSampler): per-fold stall
    // adjudicates a slow fold from inside its own window
    val stallNanos = StallSampler.start()
    val foldSec = Array.ofDim[Double](nFolds)
    val foldStall = Array.ofDim[Double](nFolds)
    val probes = Array.ofDim[Double](nFolds)
    val survivors = Array.ofDim[Long](nFolds)
    val fBands = Array.ofDim[Int](nFolds)
    val fShingles = Array.ofDim[Int](nFolds)
    val fCounts = Array.ofDim[Int](nFolds)
    for (i <- 0 until nFolds) {
      val lo = cuts(i)
      val hi = if (i == nFolds - 1) cuts(i + 1) + 1 else cuts(i + 1)
      val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val st0 = stallNanos.get
      val t0 = System.nanoTime()
      val surv = graft.operators.Dedup.incrementalMinhashDedup(batch,
        prefix, "text", "doc_id", threshold = 0.8, buckets = buckets,
        foldTag = Some(s"fold-$i"))
      survivors(i) = surv.count()
      surv.unpersist()
      foldSec(i) = (System.nanoTime() - t0) / 1e9
      foldStall(i) = (stallNanos.get - st0) / 1e9
      probes(i) = calibrate()
      fBands(i) = partFiles(s"${prefix}_bands")
      fShingles(i) = partFiles(s"${prefix}_shingles")
      fCounts(i) = partFiles(s"${prefix}_bucket_counts")
      System.err.println(f"[state-soak] fold $i%2d [$lo%8d,$hi%8d): " +
        f"${foldSec(i)}%6.2fs stall=${foldStall(i)}%5.2fs " +
        f"probe=${probes(i)}%5.2fs " +
        f"surv=${survivors(i)}%6d files b/s/c=" +
        s"${fBands(i)}/${fShingles(i)}/${fCounts(i)}")
    }

    // exactly-once across the whole lineage: replay the LAST fold's tag
    val lastBatch = docs.filter(
      col("doc_id") >= cuts(nFolds - 1) && col("doc_id") <= cuts(nFolds))
    val preReplay = (fBands.last, fShingles.last, fCounts.last)
    val replaySurv = graft.operators.Dedup.incrementalMinhashDedup(
      lastBatch, prefix, "text", "doc_id", threshold = 0.8,
      buckets = buckets, foldTag = Some(s"fold-${nFolds - 1}"))
    val replayN = replaySurv.count(); replaySurv.unpersist()
    val postReplay = (partFiles(s"${prefix}_bands"),
      partFiles(s"${prefix}_shingles"), partFiles(s"${prefix}_bucket_counts"))
    val replayOk = replayN == survivors.last && postReplay == preReplay
    graft.operators.Dedup.dropIncrementalDedupState(spark, prefix)

    val violations = scala.collection.mutable.ArrayBuffer[String]()
    // compaction bound: trigger is > buckets*8 delta files; a compact
    // rewrites to `buckets` files and retains the superseded generation
    // one more fold — so the steady-state ceiling is buckets*8 (the
    // worst pre-trigger pile) + buckets (fresh compact) + buckets (the
    // retained generation) + buckets (the fold just appended)
    val countsBound = buckets * 8 + 3 * buckets
    if (fCounts.max > countsBound)
      violations += s"_bucket_counts file count ${fCounts.max} exceeds " +
        s"compaction bound $countsBound (compaction not reclaiming)"
    // bands/shingles: exactly `buckets` new files per fold (the history)
    if (fBands.last != nFolds * buckets)
      violations += s"_bands files ${fBands.last} != ${nFolds * buckets} " +
        "(buckets per fold)"
    if (fShingles.last != nFolds * buckets)
      violations += s"_shingles files ${fShingles.last} != " +
        s"${nFolds * buckets} (buckets per fold)"
    // flatness: probe-NORMALIZED fold cost (seconds per probe-second
    // neutralizes uniform host phases); the last 5 folds may cost at
    // most 3x the folds 1-5 mean (fold 0 excluded: it pays table
    // creation + first-fold fixed costs)
    val norm = foldSec.zip(probes).map { case (s, p) => s / math.max(p, 1e-9) }
    val early = norm.slice(1, 6).sum / 5.0
    val late = norm.takeRight(5).sum / 5.0
    if (late > early * 3.0)
      violations += f"per-fold cost grew ${late / early}%.2fx from folds " +
        "1-5 to the last 5 (> 3x: history is leaking into fold cost)"
    if (!replayOk)
      violations += s"tag replay broke exactly-once: survivors $replayN " +
        s"vs ${survivors.last}, files $postReplay vs $preReplay"

    def arr(xs: Seq[Double]): String =
      xs.map(d => String.format(java.util.Locale.ROOT, "%.3f",
        java.lang.Double.valueOf(d))).mkString("[", ",", "]")
    val json =
      s"""{"metric":"state_growth_soak","folds":$nFolds,"sf":"$sfDir"""" +
      s""","per_fold_sec":${arr(foldSec.toSeq)}""" +
      s""","per_fold_stall_sec":${arr(foldStall.toSeq)}""" +
      s""","calibration_runs":${arr(probes.toSeq)}""" +
      s""","survivors":${survivors.mkString("[", ",", "]")}""" +
      s""","files_bands":${fBands.mkString("[", ",", "]")}""" +
      s""","files_shingles":${fShingles.mkString("[", ",", "]")}""" +
      s""","files_counts":${fCounts.mkString("[", ",", "]")}""" +
      s""","counts_bound":$countsBound,"replay_ok":$replayOk""" +
      s""","late_over_early":${String.format(java.util.Locale.ROOT,
        "%.3f", java.lang.Double.valueOf(late / early))}""" +
      s""","head_commit":"$headCommit","git_dirty":$gitDirty""" +
      s""","violations":${violations.map("\"" + _ + "\"")
        .mkString("[", ",", "]")}}"""
    println(json)
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    docs.unpersist()
    spark.stop()
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[state-soak] FAIL: $v"))
      sys.exit(1)
    }
    System.err.println("[state-soak] PASS")
  }
}
