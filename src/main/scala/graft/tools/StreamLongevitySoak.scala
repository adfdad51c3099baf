package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Thousands-of-micro-batches longevity soak for the streaming tier.
  * The batch-parity specs prove per-batch semantics; nothing so far
  * measures STATE-STORE GROWTH and latency over a long-running stream —
  * exactly the regime where an unbounded state key-space or a
  * per-batch-growing driver cost (e.g. a root listing that scales with
  * accumulated output) turns a correct stream into a dying one.
  *
  * Three phases, each over a MemoryStream with event time advancing 5
  * minutes per micro-batch:
  *
  *  1. `windowedCounts` (1h tumbling windows, 2h watermark), 2000
  *     batches x 50 events over 8 event types: committed state rows
  *     must stay bounded by (open windows x types) — the
  *     `Streams.scala` contract that state is keyed by cardinality, not
  *     stream length — and per-batch latency must stay flat.
  *  2. `dedupWithinWatermark` on event_id, 2000 batches x 50 FRESH keys
  *     each: state must hold only the watermark horizon (~25 batches of
  *     keys), never the full 100k key history.
  *  3. `foreachBatchParquet`, 400 batches: the output root accumulates
  *     one `batch=<id>` directory per micro-batch, so flat per-batch
  *     latency here is direct evidence the old-layout migration check
  *     really runs once at sink setup — a per-batch `listStatus` would
  *     grow linearly with every committed batch.
  *
  * Flatness is judged on MEDIANS (robust to host potholes): the last
  * window's median per-batch wall time may be at most 2x the
  * post-warmup early window's, per phase. (Tightened from the original
  * 3x after the round-18 run recorded the windowed phase drifting
  * 1.37x — 449.9 -> 615.9 ms — over 2000 batches with state rows dead
  * flat: a bound the observed drift could never trip is not a trend
  * assertion. The same run also motivated capping checkpoint metadata
  * retention below.) Emits one JSON artifact (arg 1, default
  * target/soak_stream.json) with per-100-batch state-row and median-
  * latency series per phase, head commit + dirty flag; exits non-zero
  * on any violated bound.
  */
object StreamLongevitySoak {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0 else s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val outFile = args.headOption.getOrElse("target/soak_stream.json")
    // diagnosis knobs: shrink the run (and log more often) without edits
    val stateBatches =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "2000").toInt
    val sinkBatches = math.min(400, stateBatches)
    val logEvery = math.max(10, math.min(100, stateBatches / 10))
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-stream-soak")
      // state-store instances = shuffle partitions: keep the per-batch
      // fixed cost representative of a small keyed stream, not 32 empty
      // partitions of overhead
      .config("spark.sql.shuffle.partitions", "4")
      // checkpoint metadata retention: the offsets/commits logs keep
      // minBatchesToRetain entries and the state store keeps as many
      // delta generations — at the default 100 the per-batch purge and
      // maintenance walk 5x more files than 20 buys nothing for a soak
      // (or for any pipeline that never time-travels its checkpoint
      // 100 batches back). This is the retention cap the round-18 soak's
      // windowed-phase median drift (1.37x over 2000 batches, state
      // flat) pointed at; a long-running production stream should size
      // it to its replay needs, not leave the default.
      .config("spark.sql.streaming.minBatchesToRetain", "20")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

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

    // in-window stall meter (graft.tools.StallSampler): per-phase stall
    // separates "the stream slowed" from "the host/JVM starved it"
    val stallNanos = StallSampler.start()
    val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = (0 until 8).map(i => s"type_$i")
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    val phaseJson = scala.collection.mutable.ArrayBuffer[String]()

    /** Drive `build(stream)` for `nBatches` micro-batches; returns
      * (per-batch wall ms, per-batch committed state rows). */
    val phaseStall = scala.collection.mutable.Map[String, Double]()
    def drive(name: String, nBatches: Int,
        build: DataFrame => org.apache.spark.sql.streaming.StreamingQuery)
        : (Vector[Double], Vector[Long]) = {
      val st0 = stallNanos.get
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val input = MemoryStream[(Timestamp, Long, String, Double)]
      val q = build(input.toDF()
        .toDF("ts", "event_id", "event_type", "value"))
      val wall = Vector.newBuilder[Double]
      val stateRows = Vector.newBuilder[Long]
      for (b <- 0 until nBatches) {
        val t = baseMs + b.toLong * 300000L // +5 min per batch
        val rows = (0 until 50).map { j =>
          (new Timestamp(t + j * 100L), b.toLong * 50 + j,
            types((b * 50 + j) % types.size), (j % 17).toDouble)
        }
        val t0 = System.nanoTime()
        input.addData(rows)
        q.processAllAvailable()
        wall += (System.nanoTime() - t0) / 1e6
        val lp = q.lastProgress
        stateRows += (if (lp == null || lp.stateOperators == null) 0L
          else lp.stateOperators.map(_.numRowsTotal).sum)
        if ((b + 1) % logEvery == 0) {
          val w = wall.result()
          System.err.println(s"[stream-soak] $name batch ${b + 1}/" +
            s"$nBatches state=${stateRows.result().last} " +
            f"median=${median(w.takeRight(logEvery).toSeq)}%.0fms " +
            s"lastDur=${if (lp == null) "-" else lp.durationMs.toString}")
        }
      }
      q.stop()
      phaseStall(name) = (stallNanos.get - st0) / 1e9
      System.err.println(f"[stream-soak] $name phase stall: " +
        f"${phaseStall(name)}%.2fs over $nBatches batches")
      (wall.result(), stateRows.result())
    }

    def judge(name: String, wall: Vector[Double], state: Vector[Long],
        warmup0: Int, stateBound: Long): Unit = {
      val n = wall.length
      val warmup = math.min(warmup0, n / 4)
      val postWarm = state.drop(warmup)
      if (postWarm.max > stateBound)
        violations += s"$name: state rows peaked at ${postWarm.max} > " +
          s"bound $stateBound after batch $warmup (state not evicting)"
      val win = math.max(10, math.min(500, (n - warmup) / 3))
      val early = median(wall.slice(warmup, warmup + win).toSeq)
      val late = median(wall.takeRight(win).toSeq)
      if (late > early * 2.0)
        violations += f"$name: median per-batch latency grew " +
          f"${late / early}%.2fx > 2.0x bound (${early}%.0f -> " +
          f"${late}%.0fms: per-batch cost is scaling with stream age)"
      val snaps = (0 until n by 100).map { i =>
        val w = wall.slice(i, math.min(i + 100, n))
        s"""{"batch":${i + 100},"state_rows":${state(
          math.min(i + 99, n - 1))},"median_ms":${String.format(
          java.util.Locale.ROOT, "%.1f",
          java.lang.Double.valueOf(median(w.toSeq)))}}"""
      }
      // throughput at the fixed 50-events/batch input rate — THE summary
      // number an optimization round moves (median_ms is its inverse
      // lens); computed over post-warmup batches so JIT/state-store
      // bootstrap doesn't dilute it
      val postWall = wall.drop(warmup)
      val bps =
        if (postWall.isEmpty || postWall.sum <= 0) 0.0
        else postWall.length / (postWall.sum / 1000.0)
      phaseJson += s""""$name":{"batches":$n,"state_bound":$stateBound""" +
        s""","stall_sec":${String.format(java.util.Locale.ROOT, "%.2f",
          java.lang.Double.valueOf(phaseStall.getOrElse(name, 0.0)))}""" +
        s""","early_median_ms":${String.format(java.util.Locale.ROOT,
          "%.1f", java.lang.Double.valueOf(early))}""" +
        s""","late_median_ms":${String.format(java.util.Locale.ROOT,
          "%.1f", java.lang.Double.valueOf(late))}""" +
        s""","batches_per_sec":${String.format(java.util.Locale.ROOT,
          "%.2f", java.lang.Double.valueOf(bps))}""" +
        s""","events_per_sec":${String.format(java.util.Locale.ROOT,
          "%.0f", java.lang.Double.valueOf(bps * 50))}""" +
        s""","per_100":${snaps.mkString("[", ",", "]")}}"""
      System.err.println(f"[stream-soak] $name: early median $early%.0fms" +
        f" late $late%.0fms state max post-warmup ${state.drop(warmup).max}")
    }

    // phase 1: watermark-evicted windowed aggregation. Open state is
    // (watermark 2h + window 1h)/1h + in-flight ~= 4 windows x 8 types;
    // bound 64 leaves eviction-lag slack without tolerating growth
    locally {
      val cp = java.nio.file.Files
        .createTempDirectory("graft-stream-soak-cp1").toString
      val (wall, state) = drive("windowed_counts", stateBatches, df =>
        graft.streaming.Streams.windowedCounts(
          df.select(col("ts"), col("event_type"), col("value")),
          window_ = "1 hour", watermark = "2 hours")
          .writeStream.outputMode(OutputMode.Append)
          .option("checkpointLocation", cp).format("noop").start())
      judge("windowed_counts", wall, state, warmup0 = 100, stateBound = 64L)
    }

    // phase 2: watermark-evicted dedup state. Keys within the horizon:
    // 2h/5min = 24 batches x 50 fresh keys ~= 1200; bound 2500 ( <3% of
    // the 100k total keys a leak would accumulate)
    locally {
      val cp = java.nio.file.Files
        .createTempDirectory("graft-stream-soak-cp2").toString
      val (wall, state) = drive("dedup_within_watermark", stateBatches, df =>
        graft.streaming.Streams.dedupWithinWatermark(
          df, Seq("event_id"), watermark = "2 hours")
          .writeStream.outputMode(OutputMode.Append)
          .option("checkpointLocation", cp).format("noop").start())
      judge("dedup_within_watermark", wall, state,
        warmup0 = 100, stateBound = 2500L)
    }

    // phase 3: foreachBatch parquet sink — 400 batch=<id> dirs pile up
    // at the root; flat latency proves the layout check is setup-only
    locally {
      val cp = java.nio.file.Files
        .createTempDirectory("graft-stream-soak-cp3").toString
      val out = java.nio.file.Files
        .createTempDirectory("graft-stream-soak-out").toString + "/sink"
      val (wall, _) = drive("foreach_batch_parquet", sinkBatches, df =>
        graft.streaming.Streams.foreachBatchParquet(
          df, out, cp)(b => b.select(col("event_id"), col("value"))))
      val n = wall.length
      val win = math.max(10, n / 4)
      val early = median(wall.slice(n / 8, n / 8 + win).toSeq)
      val late = median(wall.takeRight(win).toSeq)
      if (late > early * 2.0)
        violations += f"foreach_batch_parquet: median per-batch latency " +
          f"grew ${late / early}%.2fx > 2.0x bound with output age " +
          f"(${early}%.0f -> ${late}%.0fms: something lists the growing " +
          "root per batch)"
      val snaps = (0 until n by 100).map { i =>
        val w = wall.slice(i, math.min(i + 100, n))
        s"""{"batch":${i + 100},"median_ms":${String.format(
          java.util.Locale.ROOT, "%.1f",
          java.lang.Double.valueOf(median(w.toSeq)))}}"""
      }
      val postWall = wall.drop(n / 8)
      val bps =
        if (postWall.isEmpty || postWall.sum <= 0) 0.0
        else postWall.length / (postWall.sum / 1000.0)
      phaseJson += s""""foreach_batch_parquet":{"batches":$n""" +
        s""","stall_sec":${String.format(java.util.Locale.ROOT, "%.2f",
          java.lang.Double.valueOf(
            phaseStall.getOrElse("foreach_batch_parquet", 0.0)))}""" +
        s""","batches_per_sec":${String.format(java.util.Locale.ROOT,
          "%.2f", java.lang.Double.valueOf(bps))}""" +
        s""","events_per_sec":${String.format(java.util.Locale.ROOT,
          "%.0f", java.lang.Double.valueOf(bps * 50))}""" +
        s""","early_median_ms":${String.format(java.util.Locale.ROOT,
          "%.1f", java.lang.Double.valueOf(early))}""" +
        s""","late_median_ms":${String.format(java.util.Locale.ROOT,
          "%.1f", java.lang.Double.valueOf(late))}""" +
        s""","per_100":${snaps.mkString("[", ",", "]")}}"""
      System.err.println(f"[stream-soak] foreach_batch_parquet: early " +
        f"median $early%.0fms late $late%.0fms over $n batches")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(out).getParentFile)
    }

    val json =
      s"""{"metric":"stream_longevity_soak"""" +
      s""","head_commit":"$headCommit","git_dirty":$gitDirty""" +
      s""","phases":{${phaseJson.mkString(",")}}""" +
      s""","violations":${violations.map("\"" + _ + "\"")
        .mkString("[", ",", "]")}}"""
    println(json)
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[stream-soak] FAIL: $v"))
      sys.exit(1)
    }
    System.err.println("[stream-soak] PASS")
  }
}
