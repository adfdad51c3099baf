package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming transforms driven synchronously against the events testdata:
  * copy the parquet into a stream-source dir, run each query to completion
  * with a memory sink, and check results against the batch counterparts.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val streamDir: String = {
    val d = "target/stream_in"
    // rebuild the events table as proper micro timestamps for streaming
    val ev = graft.Tables.events(spark, sfDir)
    ev.write.mode("overwrite").parquet(d)
    d
  }

  private lazy val batchEvents = spark.read.parquet(streamDir)

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String = "complete"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("windowed counts match the batch groupBy over the same data") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(
      Streams.windowedCounts(stream), "hourly_out")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming window-quality monitor matches the batch aggregation " +
      "(nulls counted out, HLL cardinalities identical sketch-for-sketch)") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(
      Streams.streamingWindowQuality(stream,
        Seq("user_id", "event_type")), "quality_out")
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)]
      .collect().toSet
    val want = batchEvents
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("user_id")).as("user_id_nonnull"),
        approx_count_distinct(col("user_id")).as("user_id_distinct"),
        count(col("event_type")).as("event_type_nonnull"),
        approx_count_distinct(col("event_type")).as("event_type_distinct"))
      .select(col("window.start").as("window_start"), col("n_rows"),
        col("user_id_nonnull"), col("user_id_distinct"),
        col("event_type_nonnull"), col("event_type_distinct"))
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == want)
  }

  test("streaming column checksums equal the batch fingerprints over " +
      "the same rows (order/batch-boundary independence by construction)") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val cols = Seq("user_id", "event_type", "value", "ts")
    val got = runToCompletion(
      Streams.streamingColumnChecksums(stream, cols), "ck_out")
      .as[(String, Long, Long)].collect().toSet
    val want = graft.operators.Reconcile
      .columnChecksums(batchEvents, cols)
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.size == cols.size)
  }

  test("sliding windows: streaming slidingCounts matches the batch " +
      "window(slide) aggregation exactly (x95 parity)") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(
      Streams.slidingCounts(stream), "sliding_out")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = batchEvents
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want)
    // every event lands in exactly window/slide = 4 windows
    assert(got.toSeq.map(_._3).sum == 4 * batchEvents.count())
  }

  test("session windows produce one row per (user, gap-separated session)") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(
      Streams.sessionWindows(stream, gap = "30 minutes"), "sessions_out")
    val nStreaming = got.count()
    val nBatch = graft.operators.Sessionize
      .aggregate(batchEvents, gapSeconds = 1800L).count()
    assert(nStreaming == nBatch)
    // event totals must be conserved
    assert(got.agg(sum("n_events")).head().getLong(0) == batchEvents.count())
  }

  test("dropDuplicatesWithinWatermark dedups by key") {
    val dup = batchEvents.union(batchEvents) // every event twice
    dup.write.mode("overwrite").parquet("target/stream_dup")
    val stream = Streams.parquetStream(spark, "target/stream_dup",
      batchEvents.schema)
    val got = runToCompletion(
      Streams.dedupWithinWatermark(stream, Seq("event_id")), "dedup_out",
      mode = "append")
    assert(got.count() == batchEvents.count())
  }

  test("foreachBatch appends transformed micro-batches to parquet") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val outDir = "target/stream_fb_out"
    val ckDir = "target/stream_fb_ck"
    Seq(outDir, ckDir).foreach { d =>
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
    }
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val q = Streams.foreachBatchParquet(stream, outDir, ckDir) { b =>
      b.filter(col("event_type") === "purchase")
        .withColumn("value_decimal", col("value").cast("decimal(18,2)"))
    }
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(outDir)
    assert(got.count() ==
      batchEvents.filter(col("event_type") === "purchase").count())
    assert(got.columns.contains("value_decimal"))
  }

  test("foreachBatchParquet refuses an output root holding old-layout " +
      "flat parquet files (partition discovery would reject the mix)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-fbold")
    val outDir = s"$root/out"
    val ckDir = s"$root/ck"
    // an old root-level-append layout: a flat parquet file at the root
    Seq(Tuple1(1L)).toDF("id").write.parquet(outDir)
    assert(Files.list(Paths.get(outDir)).iterator().hasNext)
    val input = MemoryStream[(Long, String)]
    // the refusal fires at stream SETUP (the invariant cannot regress
    // once the sink owns the path, and a per-micro-batch listing would
    // grow with the number of batch= directories) — the stream never
    // starts against the poisoned root
    val ex = intercept[IllegalStateException] {
      Streams.foreachBatchParquet(
        input.toDF().toDF("id", "payload"), outDir, ckDir)(identity)
    }
    assert(ex.getMessage.contains("old root-level-append"),
      s"expected the old-layout refusal, got: ${ex.getMessage}")
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("an unparsable __started pre-marker (crash mid-write) is treated " +
      "as absent and atomically rewritten, not a permanent MatchError " +
      "wedge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdcmark")
    val (tbl, agg, ckpt) = (s"$root/tbl", s"$root/agg", s"$root/ckpt")
    try {
      val input = MemoryStream[(Long, String, Double)]
      def start() = Streams.foreachBatchCdcAggregate(
        input.toDF().toDF("id", "g", "v"), tbl, agg, ckpt,
        Seq("id"), "g", "v")
      val q = start()
      input.addData((1L, "a", 10.0), (2L, "b", 7.0))
      q.processAllAvailable()
      q.stop()
      // a previous attempt at batch 1 crashed DURING the marker write:
      // the marker file exists but is empty. The marker write precedes
      // every commit in its attempt, so no commit happened — treating it
      // as absent is exactly right; the old `val Array(tb, ab) = split`
      // threw MatchError here on EVERY replay, wedging the stream.
      val fsys = new org.apache.hadoop.fs.Path(tbl)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(s"$tbl/__started/1")
      fsys.mkdirs(marker.getParent)
      fsys.create(marker, true).close() // zero bytes
      val q2 = start()
      input.addData((2L, "b", 20.0), (3L, "a", 3.0))
      q2.processAllAvailable()
      q2.stop()
      val got = graft.sources.VersionedTable.read(spark, agg)
        .as[(String, Double)].collect().toMap
      assert(got == Map("a" -> 13.0, "b" -> 20.0),
        s"marker recovery produced $got")
      // and the marker was rewritten parsable
      val in = fsys.open(marker)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      assert(s.split(",").length == 2, s"marker still unparsable: '$s'")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("foreachBatch MERGE upserts micro-batches into a versioned table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-fbm")
      .toString + "/tbl"
    val ck = java.nio.file.Files.createTempDirectory("graft-fbm-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = Streams.foreachBatchMerge(
      input.toDF().toDF("id", "payload"), root, ck, Seq("id"))()
    // batch 1 initializes; batch 2 updates id=2 and inserts id=3
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "b2"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val got = graft.sources.VersionedTable.read(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // the v0 snapshot is exactly batch 1 — each micro-batch is one version
    assert(graft.sources.VersionedTable.read(spark, root, Some(0))
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("MERGE sink kill-and-replay: replayed batch leaves versions and rows unchanged") {
    // Same crash window as the near-dedup replay spec, applied to the
    // versioned-table MERGE sink: foreachBatch committed (MERGE + marker)
    // but the process died before the streaming checkpoint recorded the
    // batch. On restart Spark re-fires the same batchId with the same
    // data; the marker must skip it WHOLE — version history untouched,
    // not merely row-set-converged.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-fbm-replay").toString + "/tbl"
    val ck = Files.createTempDirectory("graft-fbm-replay-ck").toString
    def start(input: MemoryStream[(Long, String)]) =
      Streams.foreachBatchMerge(
        input.toDF().toDF("id", "payload"), root, ck, Seq("id"))()
    val input = MemoryStream[(Long, String)]
    val q = start(input)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((2L, "b2"), (3L, "c"))
    q.processAllAvailable()
    q.stop()

    def rows(): Seq[(Long, String)] = graft.sources.VersionedTable
      .read(spark, root).orderBy("id").as[(Long, String)].collect().toSeq
    val rows0 = rows()
    val version0 = graft.sources.VersionedTable.latestVersion(spark, root)
    assert(rows0 == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(version0 == 1) // one version per micro-batch

    // kill: drop the batch-1 checkpoint commit (and its local-fs crc
    // sidecar), keeping offsets — the state a crash between sink commit
    // and checkpoint commit leaves behind
    def dropCommit1(): Unit = {
      assert(Files.deleteIfExists(Paths.get(ck, "commits", "1")),
        "expected commits/1 to exist")
      Files.deleteIfExists(Paths.get(ck, "commits", ".1.crc"))
    }
    dropCommit1()

    // replay with the MARKER present: skipped whole — same latest version
    // (no phantom MERGE commit), same rows
    val q2 = start(input)
    q2.processAllAvailable()
    q2.stop()
    assert(graft.sources.VersionedTable.latestVersion(spark, root) == version0,
      "a marker-skipped replay must not commit a new version")
    assert(rows() == rows0)

    // replay with the marker ALSO gone (crash before the marker write):
    // the batch re-MERGEs — one extra version, but the row set converges
    // by upsert semantics, and the marker is re-created
    dropCommit1()
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsys.delete(
      new org.apache.hadoop.fs.Path(s"$root/__committed/1"), false))
    val q3 = start(input)
    q3.processAllAvailable()
    q3.stop()
    assert(graft.sources.VersionedTable.latestVersion(spark, root) == version0 + 1)
    assert(rows() == rows0,
      "a partially-committed replay must converge to the same row set")
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/__committed/1")))
  }

  test("CDC aggregate crash-replay: a crash between the base MERGE and " +
      "the aggregate update replays EXACTLY-ONCE (delta recomputed from " +
      "the recorded pre-batch versions, not from the crashed leftovers)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdcrep")
    val (tbl, agg, ckpt) = (s"$root/tbl", s"$root/agg", s"$root/ckpt")
    try {
      val input = MemoryStream[(Long, String, Double)]
      def start() = Streams.foreachBatchCdcAggregate(
        input.toDF().toDF("id", "g", "v"), tbl, agg, ckpt,
        Seq("id"), "g", "v")
      val q = start()
      input.addData((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      q.processAllAvailable()
      input.addData((2L, "a", 20.0), (4L, "b", 3.0))
      q.processAllAvailable()
      q.stop()
      // ground truth after both batches: a = 30, b = 10
      // reconstruct the crash state batch 1 leaves when it dies AFTER
      // the base-table merge but BEFORE the aggregate update + marker:
      // streaming commit gone, committed marker gone, base table keeps
      // the merge, aggregate rolled back to its pre-batch version (the
      // __started/1 pre-marker survives — that is the protocol's point)
      assert(Files.deleteIfExists(Paths.get(ckpt, "commits", "1")))
      Files.deleteIfExists(Paths.get(ckpt, "commits", ".1.crc"))
      val fsys = new org.apache.hadoop.fs.Path(root.toString)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsys.delete(
        new org.apache.hadoop.fs.Path(s"$tbl/__committed/1"), false))
      assert(fsys.delete(new org.apache.hadoop.fs.Path(s"$agg/v=1"), true))
      val out = fsys.create(
        new org.apache.hadoop.fs.Path(s"$agg/_LATEST"), true)
      try out.write("0".getBytes("UTF-8")) finally out.close()
      // replay: the delta must be recomputed from the RECORDED pre-batch
      // base version (a naive before=latest read after the crashed merge
      // sees an empty change feed and loses the delta forever)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val got = graft.sources.VersionedTable.read(spark, agg)
        .as[(String, Double)].collect().toMap
      val want = graft.sources.VersionedTable.read(spark, tbl)
        .groupBy("g").agg(sum("v").as("s"))
        .as[(String, Double)].collect().toMap
      assert(want === Map("a" -> 30.0, "b" -> 10.0))
      want.foreach { case (g, x) =>
        assert(math.abs(got(g) - x) < 1e-9,
          s"group $g: got ${got.get(g)}, want $x — zero- or double-applied")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("a within-horizon straggler cannot crash the sessionizer: the " +
      "close-timeout floors at the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = Streams.statefulSessionizeStream(
      input.toDF().toDF("user_id", "event_id", "ts"),
      gapSeconds = 1800L, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_straggler").start()
    // batch 1 advances the watermark to 19:00 (max 20:00 - 1h)
    input.addData((1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 2L, ts("2024-01-01 20:00:00")))
    q.processAllAvailable()
    // batch 2: a straggler for user 1 at 18:20 — last + gap = 18:50 is
    // BELOW the 19:00 watermark, which setTimeoutTimestamp rejects
    // without the floor (IllegalArgumentException fails the query)
    input.addData((1L, 3L, ts("2024-01-01 18:20:00")))
    q.processAllAvailable()
    // sentinel far ahead: every session closes
    input.addData((3L, 4L, ts("2024-01-02 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_straggler")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.contains(1L) && got.contains(2L))
    // the straggler folded without crashing; durations stay non-negative
    got.values.foreach(r => assert(r._4 >= 0L, r))
  }

  test("streaming near-dedup removes cross-batch near-duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-snd").toString +
      "/out"
    val ck = java.nio.file.Files.createTempDirectory("graft-snd-ck").toString
    val prefix = s"snd_spec_${System.nanoTime()}"
    val base =
      "the quick brown fox jumps over the lazy dog near the river today"
    try {
      val input = MemoryStream[(Long, String)]
      val q = Streams.foreachBatchNearDedup(
        input.toDF().toDF("doc_id", "text"), out, ck, prefix,
        "text", "doc_id", threshold = 0.6)
      input.addData((1L, base), (2L, "unrelated first batch material here"))
      q.processAllAvailable()
      // 11 near-dups 1 (from the PREVIOUS batch); 12 is fresh
      input.addData((11L, base.replace("today", "tonight")),
        (12L, "entirely new second batch document with novel words"))
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out).select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 2L, 12L), s"got $got")
    } finally graft.operators.Dedup.dropIncrementalDedupState(spark, prefix)
  }

  test("near-dedup kill-and-replay: a replayed committed batch changes nothing") {
    // The crash window the commit markers exist for: foreachBatch completed
    // (output + marker written) but the process died BEFORE the streaming
    // checkpoint recorded the batch commit. On restart Spark replays the
    // same batchId with the same data. Simulate it for real through the
    // engine: delete the checkpoint's last commits/ entry and restart the
    // query on the same checkpoint — the batch re-fires, the marker path
    // must skip it, and survivors AND dedup state must be byte-identical.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft-snd-replay").toString + "/out"
    val ck = Files.createTempDirectory("graft-snd-replay-ck").toString
    val prefix = s"snd_replay_${System.nanoTime()}"
    val base =
      "the quick brown fox jumps over the lazy dog near the river today"
    try {
      val input = MemoryStream[(Long, String)]
      val q = Streams.foreachBatchNearDedup(
        input.toDF().toDF("doc_id", "text"), out, ck, prefix,
        "text", "doc_id", threshold = 0.6)
      input.addData((1L, base), (2L, "unrelated first batch material here"))
      q.processAllAvailable()
      // batch 1: 11 near-dups 1 (cross-batch), 12 is fresh
      input.addData((11L, base.replace("today", "tonight")),
        (12L, "entirely new second batch document with novel words"))
      q.processAllAvailable()
      q.stop()

      def survivors(): Set[Long] = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      def stateRows(): (Long, Long) =
        (spark.table(s"${prefix}_bands").count(),
          spark.table(s"${prefix}_shingles").count())
      val survivors0 = survivors()
      val state0 = stateRows()
      assert(survivors0 == Set(1L, 2L, 12L), s"got $survivors0")

      // kill: drop the batch-1 checkpoint commit, keeping its offsets —
      // exactly the state a crash between sink and checkpoint leaves.
      // (also the local ChecksumFs .crc sidecar, or the re-commit's
      // rename-into-place fails on the stale crc)
      def dropCommit1(): Unit = {
        assert(Files.deleteIfExists(Paths.get(ck, "commits", "1")),
          "expected commits/1 to exist")
        Files.deleteIfExists(Paths.get(ck, "commits", ".1.crc"))
      }
      dropCommit1()

      // replay with the MARKER present: the batch must be skipped whole —
      // no survivor change, and NO state re-fold (state row counts equal)
      val q2 = Streams.foreachBatchNearDedup(
        input.toDF().toDF("doc_id", "text"), out, ck, prefix,
        "text", "doc_id", threshold = 0.6)
      q2.processAllAvailable()
      q2.stop()
      assert(survivors() == survivors0)
      assert(stateRows() == state0,
        "a marker-skipped replay must not re-fold dedup state")

      // replay with the marker ALSO gone (crash between the state fold's
      // manifest flip and the sink marker): the batch re-executes, but the
      // fold's own foldTag (the batch id, already committed in the state
      // manifest) skips the re-fold WHOLE — state is bit-identical, not
      // merely "semantically harmless duplicates", and the output dir
      // overwrites to the same survivor set from the pinned verdict
      dropCommit1()
      val fsys = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsys.delete(
        new org.apache.hadoop.fs.Path(s"$out/__committed/1"), false))
      val q3 = Streams.foreachBatchNearDedup(
        input.toDF().toDF("doc_id", "text"), out, ck, prefix,
        "text", "doc_id", threshold = 0.6)
      q3.processAllAvailable()
      q3.stop()
      assert(survivors() == survivors0,
        "a partially-committed replay must converge to the same survivors")
      assert(stateRows() == state0,
        "a tag-matched replay must not re-fold dedup state")
      // positive proof the batch re-fired (not merely "nothing changed"):
      // the deleted marker was re-created by the re-execution
      assert(fsys.exists(
        new org.apache.hadoop.fs.Path(s"$out/__committed/1")))
    } finally graft.operators.Dedup.dropIncrementalDedupState(spark, prefix)
  }

  test("stream-stream interval join matches batch attribution join") {
    val ev = batchEvents
    val purchases = ev.filter($"event_type" === "purchase")
      .select("user_id", "event_id", "ts")
    val views = ev.filter($"event_type" === "view")
      .select("user_id", "event_id", "ts")
    purchases.write.mode("overwrite").parquet("target/stream_p")
    views.write.mode("overwrite").parquet("target/stream_v")

    val got = runToCompletion(
      Streams.intervalJoin(
        Streams.parquetStream(spark, "target/stream_p", purchases.schema),
        Streams.parquetStream(spark, "target/stream_v", views.schema),
        key = "user_id", horizon = "1 hour"),
      "ij_out", mode = "append")
      .select($"event_id", $"r_event_id")
      .as[(Long, Long)].collect().toSet

    val want = purchases.as("p")
      .join(views.as("v"),
        $"p.user_id" === $"v.user_id" &&
          $"v.ts" >= $"p.ts" - expr("INTERVAL 1 HOUR") &&
          $"v.ts" <= $"p.ts")
      .select($"p.event_id", $"v.event_id")
      .as[(Long, Long)].collect().toSet

    assert(got == want)
    assert(want.nonEmpty) // the testdata must actually exercise the join
  }

  test("watermark drops events later than the allowed lateness") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      window_ = "1 hour", watermark = "30 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_out").start()
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: events up to 12:00 -> watermark advances to 11:30
    input.addData((ts("2024-01-01 10:10:00"), "view", 1.0),
      (ts("2024-01-01 12:00:00"), "view", 1.0))
    q.processAllAvailable()
    // batch 2: an event at 10:20 is older than the 11:30 watermark -> must
    // be DROPPED; an 11:40 event is within lateness -> must be counted
    input.addData((ts("2024-01-01 10:20:00"), "view", 1.0),
      (ts("2024-01-01 11:40:00"), "view", 1.0))
    q.processAllAvailable()
    // close all windows
    input.addData((ts("2024-01-01 23:00:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("late_out")
      .select($"window_start".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    assert(counts("2024-01-01 10:00:00") == 1L) // late 10:20 dropped
    assert(counts("2024-01-01 11:00:00") == 1L) // 11:40 kept
    assert(counts("2024-01-01 12:00:00") == 1L)
  }

  test("event-time timeout closes the final open session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Long, Timestamp)]
    val sessions = Streams.statefulSessionizeStream(
      input.toDF().toDF("user_id", "event_id", "ts"),
      gapSeconds = 1800L, watermark = "10 minutes")
    val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ett_out").start()
    // session 1: two events for user 7
    input.addData((7L, 1L, ts("2024-01-01 10:00:00")),
      (7L, 2L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // a later event closes session 1 inline and opens session 2
    input.addData((7L, 3L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // another user's event only advances the watermark past 13:00 + gap ->
    // user 7's session 2 must be closed by TIMEOUT, not by a later event
    input.addData((9L, 4L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ett_out")
      .select($"user_id", $"session_seq", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((7L, 1L, 2L)), s"inline-closed session missing: $out")
    assert(out.contains((7L, 2L, 1L)), s"timeout-closed session missing: $out")
  }

  test("transformWithState sessionizer matches the FMGWS contract") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    // transformWithState only runs on the RocksDB provider
    val prev = StateOps.useRocksDb(spark)
    try {
      val input = MemoryStream[(Long, Long, Timestamp)]
      val sessions = Streams.transformWithStateSessionize(
        input.toDF().toDF("user_id", "event_id", "ts"),
        gapSeconds = 1800L, watermark = "10 minutes")
      val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("tws_out").start()
      input.addData((7L, 1L, ts("2024-01-01 10:00:00")),
        (7L, 2L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // closes session 1 inline, opens session 2
      input.addData((7L, 3L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      // watermark passes 13:00 + gap -> session 2 closes by TIMER
      input.addData((9L, 4L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("tws_out")
        .select($"user_id", $"session_seq", $"n_events", $"duration_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(out.contains((7L, 1L, 2L, 300000000L)),
        s"inline-closed session missing: $out")
      assert(out.contains((7L, 2L, 1L, 0L)),
        s"timer-closed session missing: $out")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming top-k leaderboard tracks the k best per key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val prev = StateOps.useRocksDb(spark)
    try {
      val input = MemoryStream[(String, Long, Double)]
      val top = Streams.streamingTopK(
        input.toDF().toDF("event_type", "event_id", "value"), k = 2)
      val q = top.toDF().writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("topk_out").start()
      input.addData(("view", 1L, 5.0), ("view", 2L, 9.0), ("click", 3L, 1.0))
      q.processAllAvailable()
      // a better event displaces rank 2; a worse one changes nothing
      input.addData(("view", 4L, 7.0), ("view", 5L, 0.5))
      q.processAllAvailable()
      q.stop()
      // Update-mode memory sink: latest emission per (key, rank) is current
      val rows = spark.table("topk_out")
      val latest = rows
        .withColumn("__n", monotonically_increasing_id())
        .orderBy($"__n".desc)
        .select($"event_type", $"rank", $"event_id", $"value")
        .collect()
        .groupBy(r => (r.getString(0), r.getInt(1)))
        .map { case (kk, vs) => kk -> (vs.head.getLong(2), vs.head.getDouble(3)) }
      assert(latest(("view", 1)) == (2L, 9.0))
      assert(latest(("view", 2)) == (4L, 7.0))
      assert(latest(("click", 1)) == (3L, 1.0))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bootstrapped sessionizer continues batch-computed open sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    def us(s: String) = ts(s).getTime * 1000L
    val prev = StateOps.useRocksDb(spark)
    try {
      // batch cutover state: user 7 is mid-session 3 (4 events, last 10:00)
      val init = Seq(
        (7L, Streams.UserSessionState(3L, us("2024-01-01 10:00:00"), 4L,
          us("2024-01-01 09:30:00"))))
        .toDS()
      val input = MemoryStream[(Long, Long, Timestamp)]
      val sessions = Streams.transformWithStateSessionizeBootstrapped(
        input.toDF().toDF("user_id", "event_id", "ts"), init,
        gapSeconds = 1800L, watermark = "10 minutes")
      val q = sessions.toDF().writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-boot-cp").toString)
        .format("memory").queryName("boot_out").start()
      // 10:10 is within the gap of the seeded session -> must CONTINUE it
      input.addData((7L, 10L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // 13:00 closes session 3 (now 5 events) and opens session 4
      input.addData((7L, 11L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("boot_out")
        .select($"user_id", $"session_seq", $"n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(out.contains((7L, 3L, 5L)),
        s"seeded session not continued: $out")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("MapState user profile accumulates per-type counts across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val prev = StateOps.useRocksDb(spark)
    try {
      val input = MemoryStream[(Long, String, Timestamp)]
      val prof = Streams.streamingUserProfile(
        input.toDF().toDF("user_id", "event_type", "ts"))
      val q = prof.toDF().writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("prof_out").start()
      input.addData((1L, "view", ts("2024-01-01 10:00:00")),
        (1L, "view", ts("2024-01-01 10:05:00")),
        (1L, "click", ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      input.addData((1L, "view", ts("2024-01-01 11:00:00")),
        (2L, "view", ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("prof_out")
        .withColumn("__n", monotonically_increasing_id())
        .orderBy($"__n".desc)
        .select($"user_id", $"event_type", $"n_events", $"last_ts_us")
        .collect()
        .groupBy(r => (r.getLong(0), r.getString(1)))
        .map { case (k, vs) => k -> (vs.head.getLong(2), vs.head.getLong(3)) }
      // counts accumulate ACROSS batches; last-seen advances
      assert(rows((1L, "view")) ==
        (3L, ts("2024-01-01 11:00:00").getTime * 1000L))
      assert(rows((1L, "click")) ==
        (1L, ts("2024-01-01 10:01:00").getTime * 1000L))
      assert(rows((2L, "view")) ==
        (1L, ts("2024-01-01 11:30:00").getTime * 1000L))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("stateful sessionization (flatMapGroupsWithState) closes sessions on gaps") {
    import Streams._
    implicit val soEnc = org.apache.spark.sql.Encoders.product[SessionOut]
    implicit val stEnc = org.apache.spark.sql.Encoders.product[UserSessionState]
    val ds = batchEvents
      .select($"user_id", $"event_id", unix_micros($"ts").as("tsMicros"),
        $"value")
      .as[UserEvent](org.apache.spark.sql.Encoders.product[UserEvent])
    val out = Streams.statefulSessionize(ds, gapSeconds = 1800L).collect()
    // emits all but each user's final (still-open) session
    val batchSessions = graft.operators.Sessionize
      .aggregate(batchEvents, gapSeconds = 1800L)
    val users = batchEvents.select("user_id").distinct().count()
    assert(out.length == batchSessions.count() - users)
    // emitted sessions must match the batch aggregate rows exactly
    val batchMap = batchSessions
      .select($"user_id", $"session_seq", $"n_events", $"duration_us")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    out.foreach { s =>
      assert(batchMap((s.user_id, s.session_seq)) == ((s.n_events, s.duration_us)),
        s"session mismatch for user ${s.user_id} seq ${s.session_seq}")
    }
  }

  test("streaming funnel matches the batch funnel, including a " +
      "late-arriving earlier step-1 that rewrites a chain") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.StreamingQueryException
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("user_id", "ts", "event_type")
    val out = Streams.streamingFunnel(df,
      Seq("view", "click", "purchase"), windowSeconds = 3600,
      watermark = "4 hours")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    // batch 1: u1 full in-order chain; u3's LATER chain arrives first;
    // u4 never views; u5's click misses the window
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:15:00"), "click"),
      (4L, ts("2024-01-01 09:00:00"), "click"),
      (4L, ts("2024-01-01 09:30:00"), "purchase"),
      (5L, ts("2024-01-01 10:00:00"), "view"),
      (5L, ts("2024-01-01 11:30:00"), "click"))
    q.processAllAvailable()
    // batch 2: u2's lone view; u3's EARLIER events (inside the 4h
    // watermark slack) — the true chain is 08:00/08:20/09:00, which a
    // (t1,t2,t3)-only state that had committed to 10:00/10:15 would miss
    input.addData(
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:20:00"), "click"),
      (3L, ts("2024-01-01 09:00:00"), "purchase"))
    q.processAllAvailable()
    // sentinels: push the watermark past every user's horizon so the
    // event-time timers finalize. They must be STEP-typed: Catalyst
    // pushes the event-type filter BELOW the EventTimeWatermark node, so
    // a non-step event would be dropped before it could advance the
    // watermark (in production real step traffic advances it). User 999's
    // own funnel (a lone view) finalizes after the last sentinel.
    input.addData((999L, ts("2024-01-01 23:00:00"), "view"))
    q.processAllAvailable()
    input.addData((999L, ts("2024-01-02 12:00:00"), "view"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(got === Map(
      1L -> ((3L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00"),
        us("2024-01-01 11:00:00"))),
      2L -> ((1L, us("2024-01-01 09:00:00"), -1L, -1L)),
      3L -> ((3L, us("2024-01-01 08:00:00"), us("2024-01-01 08:20:00"),
        us("2024-01-01 09:00:00"))),
      4L -> ((0L, -1L, -1L, -1L)),
      5L -> ((1L, us("2024-01-01 10:00:00"), -1L, -1L)),
      // the first sentinel view finalizes once the second pushes the
      // watermark past its horizon (the second's own funnel stays open)
      999L -> ((1L, us("2024-01-01 23:00:00"), -1L, -1L))))
    // parity with the batch operator over the same step events
    val stepEvents = spark.table("funnel_stream").sparkSession.createDataFrame(
      Seq(
        (1L, ts("2024-01-01 10:00:00"), "view"),
        (1L, ts("2024-01-01 10:30:00"), "click"),
        (1L, ts("2024-01-01 11:00:00"), "purchase"),
        (3L, ts("2024-01-01 10:00:00"), "view"),
        (3L, ts("2024-01-01 10:15:00"), "click"),
        (4L, ts("2024-01-01 09:00:00"), "click"),
        (4L, ts("2024-01-01 09:30:00"), "purchase"),
        (5L, ts("2024-01-01 10:00:00"), "view"),
        (5L, ts("2024-01-01 11:30:00"), "click"),
        (2L, ts("2024-01-01 09:00:00"), "view"),
        (3L, ts("2024-01-01 08:00:00"), "view"),
        (3L, ts("2024-01-01 08:20:00"), "click"),
        (3L, ts("2024-01-01 09:00:00"), "purchase"),
        (999L, ts("2024-01-01 23:00:00"), "view"),
        (999L, ts("2024-01-02 12:00:00"), "view")))
      .toDF("user_id", "ts", "event_type")
    val b = graft.operators.Funnel.conversion(stepEvents, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"),
      windowSeconds = 3600).collect()(0)
    assert(b.getAs[Long]("n_s1") === got.values.count(_._1 >= 1L).toLong)
    assert(b.getAs[Long]("n_s12") === got.values.count(_._1 >= 2L).toLong)
    assert(b.getAs[Long]("n_s123") === got.values.count(_._1 >= 3L).toLong)
  }

  test("CDC-maintained aggregate table tracks the base table exactly " +
      "across streamed upserts, including value rewrites and new groups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdcagg")
    val (tbl, agg, ckpt) = (s"$root/tbl", s"$root/agg", s"$root/ckpt")
    try {
      val input = MemoryStream[(Long, String, Double)]
      val q = Streams.foreachBatchCdcAggregate(
        input.toDF().toDF("id", "g", "v"), tbl, agg, ckpt,
        Seq("id"), "g", "v")
      input.addData((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0))
      q.processAllAvailable()
      // batch 2: rewrite id=2 (a: -5 +20), move id=3 to group c
      // (b retracts 7, c adds 7), insert id=4 into b
      input.addData((2L, "a", 20.0), (3L, "c", 7.0), (4L, "b", 3.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(
        s"$agg/v=${graft.sources.VersionedTable.latestVersion(spark, agg)}")
        .as[(String, Double)].collect().toMap
      val want = graft.sources.VersionedTable.read(spark, tbl)
        .groupBy("g").agg(sum("v").as("s"))
        .as[(String, Double)].collect().toMap
      assert(want === Map("a" -> 30.0, "b" -> 3.0, "c" -> 7.0))
      want.foreach { case (g, s) =>
        assert(math.abs(got(g) - s) < 1e-9, g)
      }
      // the aggregate table is itself versioned: one version per batch
      assert(graft.sources.VersionedTable
        .latestVersion(spark, agg) === 1)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
  }

  test("streaming EWMA matches the batch recurrence exactly for every " +
      "watermark-closed period; late counts fold before their period " +
      "closes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_type", "ts")
    val q = Streams.streamingEwma(df, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_out").start()
    // hour 10: 2 events; hour 11: 1 event (so far)
    input.addData(("m", ts("2024-01-01 10:10:00")),
      ("m", ts("2024-01-01 10:40:00")), ("m", ts("2024-01-01 11:20:00")))
    q.processAllAvailable()
    // LATE row for hour 11 (watermark still at 09:20) + hour 12 row
    input.addData(("m", ts("2024-01-01 11:05:00")),
      ("m", ts("2024-01-01 12:30:00")))
    q.processAllAvailable()
    // sentinel far ahead: watermark passes every real period's end
    input.addData(("zz", ts("2024-01-02 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_out")
      .filter(col("event_type") === "m")
      .orderBy("period_start")
      .as[(String, Long, Long, Double)].collect().toSeq
    // batch recurrence (alpha=.2): h10 n=2 e=2; h11 n=2 (late row
    // INCLUDED) e=.2*2+.8*2=2; h12 n=1 e=.2*1+.8*2=1.8
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000L
    assert(got === Seq(("m", h10, 2L, 2.0),
      ("m", h10 + 3600L, 2L, 2.0), ("m", h10 + 7200L, 1L, 1.8)))
  }

  test("streaming EWMA over the full events stream matches batch for " +
      "every closed period (gap semantics included)") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(
      Streams.streamingEwma(stream.select(col("event_type"), col("ts")),
        watermark = "2 hours").toDF(),
      "ewma_full", mode = "append")
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val want = graft.operators.Anomaly.ewmaSmooth(batchEvents)
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // streaming emits exactly the batch rows for every period the final
    // watermark closed (the unclosed tail stays in state)
    assert(got.nonEmpty)
    got.foreach { case (k, v) => assert(want(k) === v, k) }
    val wmUs = batchEvents.agg(max(unix_micros(col("ts")))).head().getLong(0) -
      2L * 3600L * 1000000L
    val expectedClosed = want.keys.count { case (_, p) =>
      (p + 3600L) * 1000000L <= wmUs
    }
    assert(got.size >= expectedClosed)
  }

  test("streaming OHLC bars match the batch resampler over the same " +
      "data") {
    val stream = Streams.parquetStream(spark, streamDir, batchEvents.schema)
    val got = runToCompletion(Streams.streamingOhlc(stream), "ohlc_out")
      .select(unix_timestamp(col("window_start")).as("period_start"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n"), col("vsum"))
      .as[(Long, String, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    val want = graft.operators.TimeSeries.ohlcBars(batchEvents)
      .select(col("period_start"), col("event_type"), col("open"),
        col("high"), col("low"), col("close"), col("n"), col("vsum"))
      .as[(Long, String, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    assert(got == want)
  }

  test("streaming OHLC: a late-but-within-watermark earlier row rewrites " +
      "the bar's open, matching what batch would have built") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Streams.streamingOhlc(df, watermark = "2 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("ohlc_late").start()
    input.addData((2L, ts("2024-01-01 10:30:00"), "m", 5.0),
      (3L, ts("2024-01-01 10:45:00"), "m", 9.0))
    q.processAllAvailable()
    // late row EARLIER in the same bar, within the watermark
    input.addData((1L, ts("2024-01-01 10:05:00"), "m", 2.0))
    q.processAllAvailable()
    q.stop()
    val bar = spark.table("ohlc_late").head()
    assert(bar.getAs[Double]("open") === 2.0) // the late row owns the open
    assert(bar.getAs[Double]("close") === 9.0)
    assert(bar.getAs[Double]("high") === 9.0)
    assert(bar.getAs[Long]("n") === 3L)
  }
}
