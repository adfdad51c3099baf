package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (extension tier — the reference has no
  * streaming at all, SURVEY.md §2.10). Batch counterparts of these transforms
  * live in [[graft.QueriesExt]] / [[graft.operators.Sessionize]], which is
  * what the DuckDB oracle checks; these builders run the same logic
  * incrementally with watermark-bounded state.
  *
  * Scale notes: every aggregation below keys its state by (window x type) or
  * user — state size is bounded by key cardinality, not stream length, and
  * watermarks let Spark evict finished windows. At 100 TB/day the same code
  * runs with a real source (Kafka/files) and checkpointed state store; the
  * shuffle partitioning rules match the batch operators (hash on group key).
  */
object Streams {

  /** File-source stream over a directory of parquet (schema must be supplied;
    * streaming reads don't infer).
    */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling-window counts/sums per event type with a watermark for state
    * eviction and late-data tolerance.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming OHLC bars — the incremental counterpart of
    * [[graft.operators.TimeSeries.ohlcBars]]: per (type, tumbling window)
    * open/high/low/close of `value`, open/close picked by the
    * (ts, event_id) total order via min_by/max_by over a struct key, so a
    * bar is DETERMINISTIC under any arrival order — late rows within the
    * watermark revise the same bar the batch operator would have built
    * (parity spec'd incl. a late row that rewrites an open). All five
    * aggregates are algebraic, so state per (type, window) is one partial
    * bar, map-side combined like the batch plan.
    */
  def streamingOhlc(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("vsum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"),
        col("vsum"))

  /** Per-window streaming data-quality monitor — the streaming form of
    * the [[graft.operators.Profile]] tier: per (tumbling window, column)
    * row count, null rate, and HLL cardinality, the live feed-health
    * dashboard a multi-source ingest runs (a feed whose null rate spikes
    * or whose id cardinality collapses shows up within one window +
    * watermark delay). Exact `count(distinct)` is unsupported in
    * streaming aggregations, and would hold unbounded state anyway —
    * `approx_count_distinct` keeps the state per (window, column) at one
    * fixed-size HLL sketch, the same swap the batch profiler's 100 TB
    * form makes. All aggregates are algebraic → map-side partials, one
    * shuffle, append-mode emission once the watermark closes the window.
    */
  def streamingWindowQuality(events: DataFrame, cols: Seq[String],
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(cols.nonEmpty, "monitor at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nonnull"),
        approx_count_distinct(col(c)).as(s"${c}_distinct"))
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +:
        (col("n_rows") +: cols.flatMap(c =>
          Seq(col(s"${c}_nonnull"), col(s"${c}_distinct")))): _*)
  }

  /** Streaming column checksums — the reconciliation tier's continuous
    * form: a running per-column portable multiset fingerprint
    * ([[graft.operators.Reconcile.columnChecksums]]'s exact encodings,
    * exact same tidy output) maintained incrementally over the stream.
    * Run it on BOTH sides of a replicated ingestion (or stream vs the
    * batch table it lands in) and compare a handful of longs per
    * micro-batch — the streaming twin of the batch workflow's step 1.
    * State is ALGEBRAIC and O(columns): two longs per column (count +
    * running sum of encodings), no watermark needed — a running total
    * over everything seen, emitted in complete/update mode. The sum is
    * order- and batch-boundary-independent, so stream ≡ batch over the
    * same rows by construction (parity-spec'd).
    */
  def streamingColumnChecksums(stream: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum at least one column")
    val (head, tail) = graft.operators.Reconcile.checksumAggs(stream, cols)
    graft.operators.Reconcile.unpivotChecksums(
      stream.agg(head, tail: _*), cols, Nil)
  }

  /** Sliding-window counts (window/slide), watermarked. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows per user (gap-merged), the streaming counterpart of
    * [[graft.operators.Sessionize]].
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup by key within the watermark horizon (streaming
    * counterpart of the reference's latest-record dedup D1).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Batch idempotence-marker protocol shared by the foreachBatch sinks:
    * `__committed/<batchId>` under `markerRoot` marks a FULLY committed
    * batch; `body` runs only when the marker is absent, and the marker is
    * written after it completes — a replay of a committed batch is
    * skipped WHOLE.
    *
    * SCOPE LIMIT (by construction): batchIds are scoped to a streaming
    * CHECKPOINT, while the markers live with the OUTPUT. Restarting a
    * query against an existing output with a FRESH checkpoint restarts
    * batchIds at 0, and the old markers would silently skip the new
    * query's first batches — pass a new `tag` (or a clean output root)
    * whenever the checkpoint is not the one that produced the markers.
    */
  private def withBatchMarker(spark: org.apache.spark.sql.SparkSession,
      root: String, tag: String, batchId: Long)(body: => Unit): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = if (tag.isEmpty) s"$root/__committed"
      else s"$root/__committed/$tag"
    val marker = new org.apache.hadoop.fs.Path(s"$dir/$batchId")
    val fsys = marker.getFileSystem(hconf)
    if (!fsys.exists(marker)) {
      body
      fsys.mkdirs(marker.getParent)
      fsys.create(marker, true).close()
    }
  }

  /** foreachBatch sink: apply `transform` to each micro-batch and land it
    * under the parquet path with exactly-once tracking via the checkpoint.
    * This is the incremental-pipeline seam — with a transactional table
    * format (Delta/Iceberg) the body becomes a MERGE; with plain parquet
    * each batch OVERWRITES its own `batch=<id>` partition directory, so a
    * micro-batch replayed after a crash between the sink write and the
    * streaming-checkpoint commit rewrites the same directory instead of
    * appending duplicates (a blind root-level append is NOT replay-safe).
    * Readers of `path` see `batch` as a partition column.
    *
    * MIGRATION: an output written by the pre-partitioned layout (flat
    * parquet files at the root) cannot be resumed into — Spark's partition
    * discovery rejects mixed flat files and `batch=` directories
    * ("Conflicting directory structures"). The sink detects old-layout
    * files at the root and fails with a clear message; restart such
    * streams against a fresh output path.
    */
  def foreachBatchParquet(stream: DataFrame, path: String,
      checkpoint: String)(
      transform: DataFrame => DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    // Old-layout detection runs ONCE at stream setup, not per micro-batch:
    // once this sink owns the path it only ever writes batch=<id>
    // directories, so the invariant cannot regress mid-stream — while the
    // root accumulates one batch directory per micro-batch, making a
    // per-batch listStatus an ever-growing object-store listing cost on
    // long-running streams.
    locally {
      val spark = stream.sparkSession
      val root = new org.apache.hadoop.fs.Path(path)
      val fsys = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fsys.exists(root)) {
        val flat = fsys.listStatus(root).find(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
        flat.foreach(st => throw new IllegalStateException(
          s"foreachBatchParquet: output $path contains flat parquet " +
          s"files from the old root-level-append layout (e.g. " +
          s"${st.getPath.getName}); mixing them with batch=<id> " +
          "partition directories breaks Spark partition discovery. " +
          "Point the restarted stream at a fresh output path."))
      }
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        transform(batch.toDF())
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .start()
  }

  /** foreachBatch MERGE sink: upsert each micro-batch into a
    * [[graft.sources.VersionedTable]] by key — the transactional
    * streaming-upsert pattern (`foreachBatch` + MERGE) realized over the
    * jar-free versioned parquet table. The first batch initializes the
    * table; every later batch commits one new version whose pointer swap
    * is atomic, so a reader of the table always sees a complete batch
    * boundary.
    *
    * Replay idempotence is two-layered, like [[foreachBatchNearDedup]]: a
    * fully-committed batch leaves a marker (`__committed/<batchId>` under
    * the table root) and a replay with the marker present is skipped WHOLE
    * — the table's version history is untouched, not just its row set. If
    * the crash landed between the MERGE commit and the marker write, the
    * replay re-MERGEs the same keys: one extra version appears but the row
    * set converges by the upsert semantics — the fallback a blind append
    * sink cannot offer.
    */
  def foreachBatchMerge(stream: DataFrame, tableRoot: String,
      checkpoint: String, keyCols: Seq[String], markerTag: String = "")(
      transform: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = transform(batch.toDF())
        val spark = b.sparkSession
        withBatchMarker(spark, tableRoot, markerTag, batchId) {
          if (graft.sources.VersionedTable.latestVersion(spark,
              tableRoot) < 0)
            graft.sources.VersionedTable.init(b, tableRoot)
          else
            graft.sources.VersionedTable.merge(spark, tableRoot, b, keyCols)
        }
        ()
      }
      .start()

  /** foreachBatch MERGE sink that ALSO maintains a downstream aggregate
    * table incrementally from the change-data feed — the CDF consumer
    * pattern end-to-end: each micro-batch upserts the base table, the
    * v(before)→v(after) feed yields per-group deltas (postimages and
    * inserts ADD, preimages and deletes RETRACT — change volume, never
    * base-table volume), and the deltas MERGE into the aggregate table.
    * Both tables are versioned, so a reader always sees batch-atomic
    * states of each; replay idempotence is the [[foreachBatchMerge]]
    * marker contract PLUS a `__started/<batchId>` pre-marker recording
    * the PRE-batch versions of both tables. The committed marker alone
    * is not enough here: a crash between the base-table MERGE and the
    * marker would make a naive replay read `before = latest` AFTER its
    * own crashed commit — an empty change feed, the batch's delta lost
    * forever (and a crash right after a first-batch `init` would
    * aggregate nothing at all). With the pre-marker, a replay recomputes
    * the delta from the ORIGINAL base version (the re-MERGE is row-set
    * idempotent, so the endpoint diff still yields exactly the batch's
    * delta), and the aggregate update is an ABSOLUTE value computed from
    * the RECORDED pre-batch aggregate version plus that delta — applying
    * it once, twice, or over a half-applied crash all converge to the
    * same rows. Exactly-once, not at-most-once.
    */
  def foreachBatchCdcAggregate(stream: DataFrame, tableRoot: String,
      aggRoot: String, checkpoint: String, keyCols: Seq[String],
      groupCol: String, valueCol: String, markerTag: String = "")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.sources.VersionedTable
        val b = batch.toDF()
        val spark = b.sparkSession
        withBatchMarker(spark, tableRoot, markerTag, batchId) {
          val hconf = spark.sparkContext.hadoopConfiguration
          val startedDir = if (markerTag.isEmpty) s"$tableRoot/__started"
            else s"$tableRoot/__started/$markerTag"
          val started = new org.apache.hadoop.fs.Path(
            s"$startedDir/$batchId")
          val fsys = started.getFileSystem(hconf)
          // pre-batch versions: recorded BEFORE any commit so a crashed
          // replay diffs from the original base, not its own leftovers
          // A marker that exists but cannot be parsed (empty/partial file
          // from a crash mid-write) is treated as ABSENT and rewritten:
          // the marker write precedes every commit in the attempt that
          // created it, so an unparsable marker proves no commit happened
          // and latestVersion still reads the true pre-batch state. The
          // rewrite itself goes through a temp path + atomic rename so a
          // crash during THIS write can never leave a partial marker that
          // wedges every later replay with a MatchError.
          def parseMarker(): Option[(Int, Int)] =
            if (!fsys.exists(started)) None
            else {
              val in = fsys.open(started)
              val s = try scala.io.Source.fromInputStream(in, "UTF-8")
                .mkString.trim finally in.close()
              s.split(",") match {
                case Array(tb, ab) =>
                  try Some((tb.trim.toInt, ab.trim.toInt))
                  catch { case _: NumberFormatException => None }
                case _ => None
              }
            }
          val (tableBefore, aggBefore): (Int, Int) =
            parseMarker().getOrElse {
              val tb = VersionedTable.latestVersion(spark, tableRoot)
              val ab = VersionedTable.latestVersion(spark, aggRoot)
              fsys.mkdirs(started.getParent)
              val tmp = new org.apache.hadoop.fs.Path(
                s"$startedDir/.$batchId.tmp")
              val out = fsys.create(tmp, true)
              try out.write(s"$tb,$ab".getBytes("UTF-8"))
              finally out.close()
              fsys.delete(started, false)
              if (!fsys.rename(tmp, started))
                throw new java.io.IOException(
                  s"could not publish batch pre-marker $started")
              (tb, ab)
            }
          if (VersionedTable.latestVersion(spark, tableRoot) < 0)
            VersionedTable.init(b, tableRoot)
          else if (tableBefore >= 0)
            // re-MERGE on replay is row-set idempotent: one extra
            // version may appear, the endpoint diff below is unchanged.
            // STRICT keys: the delta math below needs a keyed table —
            // a change feed over duplicate keys multiplies rows through
            // its full-outer join and corrupts the aggregate
            VersionedTable.merge(spark, tableRoot, b, keyCols,
              requireUniqueKeys = true)
          // (tableBefore < 0 with an existing table = replay of a
          // crashed first batch: v0 already IS this batch — skip)
          val after = VersionedTable.latestVersion(spark, tableRoot)
          val deltas = (if (tableBefore < 0)
            VersionedTable.read(spark, tableRoot, Some(after))
              .select(col(groupCol), col(valueCol).as("__d"))
          else
            VersionedTable.changeFeed(spark, tableRoot, tableBefore,
              after, keyCols)
              .select(col(groupCol),
                when(col("_change_type").isin("insert", "update_postimage"),
                  col(valueCol)).otherwise(-col(valueCol)).as("__d")))
            .groupBy(groupCol)
            .agg(sum(col("__d")).as("__delta"))
          if (aggBefore < 0 &&
              VersionedTable.latestVersion(spark, aggRoot) < 0) {
            VersionedTable.init(
              deltas.select(col(groupCol), col("__delta").as("agg_sum")),
              aggRoot)
          } else {
            // ABSOLUTE per-group values from the RECORDED pre-batch
            // aggregate version + this batch's delta: convergent under
            // replay even if a previous attempt half-applied. Only
            // CHANGED groups flow into the merge (right join keeps the
            // delta side) — delta-sized, never aggregate-table-sized.
            val current =
              if (aggBefore < 0)
                deltas.select(col(groupCol)).limit(0)
                  .withColumn("agg_sum", lit(0.0))
              else VersionedTable.read(spark, aggRoot, Some(aggBefore))
            val updated = current
              .join(deltas, Seq(groupCol), "right")
              .select(col(groupCol),
                (coalesce(col("agg_sum"), lit(0.0)) +
                  coalesce(col("__delta"), lit(0.0))).as("agg_sum"))
            VersionedTable.merge(spark, aggRoot, updated, Seq(groupCol),
              requireUniqueKeys = true)
          }
        }
        ()
      }
      .start()

  /** Streaming NEAR-duplicate dedup: each micro-batch is near-deduped
    * against every previously seen document via
    * [[graft.operators.Dedup.incrementalMinhashDedup]]'s bucketed state
    * (band rows + shingle sets), and only survivors append to `outPath`.
    * This is the streaming counterpart of `dropDuplicatesWithinWatermark`
    * for NEAR duplicates — watermark state can only hold exact keys;
    * MinHash state lives outside the streaming state store, unbounded by
    * watermarks, and the survivor set equals the one-shot greedy dedup of
    * everything ever streamed (ids must be monotone across batches).
    */
  def foreachBatchNearDedup(stream: DataFrame, outPath: String,
      checkpoint: String, statePrefix: String, textCol: String,
      idCol: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          // replay-idempotent at every crash point: a fully-committed
          // batch is skipped via its marker; a replay that crashed
          // between the state fold's manifest flip and the marker is
          // caught by the fold's OWN foldTag (the state replays the
          // pinned verdict instead of double-appending); a replay that
          // crashed mid-fold finds the torn appends swept by the fold's
          // manifest sync and re-folds cleanly. The output directory
          // overwrite of batch=<id> is idempotent in all three cases.
          val spark = batch.sparkSession
          withBatchMarker(spark, outPath, "", batchId) {
            // the survivors frame arrives PERSISTED (caller-owned, see
            // incrementalMinhashDedup): release it once written, or a
            // long-running query pins one cached frame per micro-batch
            val survivors = graft.operators.Dedup.incrementalMinhashDedup(
              batch.toDF(), statePrefix, textCol, idCol,
              threshold = threshold, foldTag = Some(batchId.toString))
            try survivors.write.mode("overwrite")
              .parquet(s"$outPath/batch=$batchId")
            finally survivors.unpersist()
          }
          ()
      }
      .start()

  /** Stream-stream interval join: each left event picks up all right events
    * with the same key whose timestamp falls in `[left.ts - horizon,
    * left.ts]` — the attribution-window join (purchase <- recent views).
    *
    * Both sides carry watermarks and the join condition bounds event time on
    * both sides, so Spark can evict right-side state once
    * `right.ts < watermark - horizon`: state is O(rate x horizon) per key
    * range, never unbounded — the only stream-stream join shape that
    * survives an always-on pipeline. (The batch as-of counterpart is
    * [[graft.operators.AsOfJoin]]; streaming cannot do "latest only" without
    * arbitrary state, so the interval form emits all matches and a
    * downstream aggregation picks winners if needed.)
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      horizon: String = "1 hour", watermark: String = "2 hours",
      rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = r0.withWatermark(s"${rightPrefix}ts", watermark)
    l.join(r,
      col(key) === col(s"$rightPrefix$key") &&
        col(s"${rightPrefix}ts") >= col("ts") - expr(s"INTERVAL $horizon") &&
        col(s"${rightPrefix}ts") <= col("ts"))
  }

  // ------------------------------------------------- custom state (FMGWS)

  final case class UserEvent(user_id: Long, event_id: Long, tsMicros: Long,
      value: Double)
  final case class UserSessionState(sessionSeq: Long, lastTsMicros: Long,
      nEvents: Long, startTsMicros: Long)
  final case class SessionOut(user_id: Long, session_seq: Long,
      n_events: Long, duration_us: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * session row whenever a gap larger than `gapSeconds` closes the previous
    * session. Demonstrates arbitrary keyed state (the escape hatch when
    * session_window's merge semantics aren't enough — e.g. per-session
    * aggregates beyond counts).
    */
  final case class TsEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp)

  /** Streaming sessionization with EVENT-TIME TIMEOUT: unlike
    * [[statefulSessionize]] (which can never emit a user's final session —
    * there is no later event to close it), this registers a timeout at
    * `lastEvent + gap`; when the watermark passes it, the open session is
    * emitted and its state evicted. This is the complete streaming
    * contract: every session is eventually emitted exactly once, and state
    * size stays bounded by the set of users active within the watermark
    * horizon.
    */
  /** The session fold shared by all three sessionizers (the
    * flatMapGroupsWithState form and both transformWithState
    * processors) — one implementation so a semantics fix cannot
    * silently miss a copy. `sorted` must be batch-sorted by
    * (ts, event_id); a CROSS-batch straggler older than the open
    * session's last event (legitimate late data inside the watermark —
    * neither API auto-drops it) folds into the session WITHOUT moving
    * its end backwards: the event count grows, `lastTsMicros` is
    * monotone, and the session duration can never shrink or go
    * negative.
    */
  private[streaming] def foldSession(user: Long, st0: UserSessionState,
      sorted: Seq[TsEvent], gapUs: Long)
      : (UserSessionState, Seq[SessionOut]) = {
    var st = st0
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val tsUs = e.ts.getTime * 1000L
      if (st.nEvents == 0L || tsUs - st.lastTsMicros > gapUs) {
        if (st.nEvents > 0L)
          out += SessionOut(user, st.sessionSeq, st.nEvents,
            st.lastTsMicros - st.startTsMicros)
        st = UserSessionState(st.sessionSeq + 1L, tsUs, 1L, tsUs)
      } else {
        st = st.copy(lastTsMicros = math.max(st.lastTsMicros, tsUs),
          nEvents = st.nEvents + 1L)
      }
    }
    (st, out.result())
  }

  def statefulSessionizeStream(events: DataFrame, gapSeconds: Long,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    implicit val evEnc = Encoders.product[TsEvent]
    implicit val stEnc = Encoders.product[UserSessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[TsEvent]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserSessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TsEvent], state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.sessionSeq, st.nEvents,
              st.lastTsMicros - st.startTsMicros))
          } else {
            val sorted = it.toSeq
              .sortBy(e => (e.ts.getTime, e.event_id))
            val (st, outs) = foldSession(user,
              state.getOption
                .getOrElse(UserSessionState(0L, Long.MinValue, 0L, 0L)),
              sorted, gapUs)
            state.update(st)
            // close the open session once the watermark passes last +
            // gap — FLOORED at watermark + 1: a within-horizon straggler
            // (which this API does not auto-drop) can otherwise compute
            // a timeout at/below the current watermark, which Spark
            // rejects with IllegalArgumentException and fails the whole
            // query (streamingEwma/streamingFunnel carry the same guard)
            state.setTimeoutTimestamp(math.max(
              st.lastTsMicros / 1000L + gapSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            outs.iterator
          }
      }
  }

  /** [[statefulSessionizeStream]] on the transformWithState API (Spark 4
    * arbitrary-state v2): explicit named `ValueState` plus event-time
    * timers instead of the single implicit state slot + timeout of
    * flatMapGroupsWithState. Same contract — every session emitted exactly
    * once, final sessions closed by timer when the watermark passes
    * `last + gap`, state bounded by watermark-active users. Requires the
    * RocksDB state store provider ([[StateOps.useRocksDb]]); the named
    * state shows up in [[StateOps.stateSnapshot]] under its variable name.
    */
  def transformWithStateSessionize(events: DataFrame, gapSeconds: Long,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc: org.apache.spark.sql.Encoder[SessionOut] =
      Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[TsEvent](Encoders.product[TsEvent])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The [[transformWithStateSessionize]] processor: gap-close on input,
    * timer-close for the final open session.
    */
  class SessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TsEvent, SessionOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    private val gapUs = gapSeconds * 1000000L
    @transient private var state: ValueState[UserSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("session",
        Encoders.product[UserSessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[TsEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val st0 =
        if (state.exists()) state.get()
        else UserSessionState(0L, Long.MinValue, 0L, 0L)
      val prevTimer = if (st0.nEvents > 0L)
        Some(st0.lastTsMicros / 1000L + gapSeconds * 1000L) else None
      val (st, outs) = foldSession(user, st0, sorted, gapUs)
      state.update(st)
      // one live timer per user: replace the previous close-timer
      val newTimer = st.lastTsMicros / 1000L + gapSeconds * 1000L
      prevTimer.filter(_ != newTimer).foreach(getHandle.deleteTimer)
      if (!prevTimer.contains(newTimer)) getHandle.registerTimer(newTimer)
      outs.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        state.clear()
        Iterator.single(SessionOut(user, st.sessionSeq, st.nEvents,
          st.lastTsMicros - st.startTsMicros))
      }
    }
  }

  final case class TopKEntry(event_type: String, rank: Int, event_id: Long,
      value: Double)

  /** Continuous per-key top-k leaderboard: for each key, maintain the k
    * highest-valued events seen so far and re-emit the leaderboard whenever
    * it changes (Update mode). Not expressible with native streaming
    * aggregations (rank-truncated state) — the transformWithState use case:
    * state is ONE bounded k-entry list per key regardless of stream length,
    * and only changed leaderboards produce output.
    */
  def streamingTopK(events: DataFrame, k: Int): Dataset[TopKEntry] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc: org.apache.spark.sql.Encoder[TopKEntry] =
      Encoders.product[TopKEntry]
    events
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)](
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaDouble))
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  /** [[transformWithStateSessionize]] warm-started from batch state — the
    * backfill→streaming handoff: a batch job computes each user's open
    * session as of the cutover ([[graft.operators.Sessionize]] tail state),
    * the streaming query seeds its keyed state from that Dataset, and the
    * first streaming events CONTINUE those sessions instead of restarting
    * numbering/counts. Seeded users also get their close-timer registered
    * immediately, so sessions with no post-cutover events still emit.
    */
  def transformWithStateSessionizeBootstrapped(events: DataFrame,
      initialState: Dataset[(Long, UserSessionState)], gapSeconds: Long,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc: org.apache.spark.sql.Encoder[SessionOut] =
      Encoders.product[SessionOut]
    implicit val stEnc: org.apache.spark.sql.Encoder[UserSessionState] =
      Encoders.product[UserSessionState]
    val init = initialState
      .groupByKey(_._1)(Encoders.scalaLong)
      .mapValues(_._2)
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[TsEvent](Encoders.product[TsEvent])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new BootstrappedSessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append(), init)
  }

  /** [[SessionProcessor]] with batch-state seeding. */
  class BootstrappedSessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, TsEvent, SessionOut, UserSessionState] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    private val gapUs = gapSeconds * 1000000L
    @transient private var state: ValueState[UserSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("session",
        Encoders.product[UserSessionState], TTLConfig.NONE)

    override def handleInitialState(user: Long, st: UserSessionState,
        timerValues: TimerValues): Unit = {
      state.update(st)
      if (st.nEvents > 0L)
        getHandle.registerTimer(st.lastTsMicros / 1000L + gapSeconds * 1000L)
    }

    override def handleInputRows(user: Long, rows: Iterator[TsEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // the fold is [[foldSession]] — shared with SessionProcessor and
      // the flatMapGroupsWithState form, so the three stay in lockstep
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val st0 =
        if (state.exists()) state.get()
        else UserSessionState(0L, Long.MinValue, 0L, 0L)
      val prevTimer = if (st0.nEvents > 0L)
        Some(st0.lastTsMicros / 1000L + gapSeconds * 1000L) else None
      val (st, outs) = foldSession(user, st0, sorted, gapUs)
      state.update(st)
      val newTimer = st.lastTsMicros / 1000L + gapSeconds * 1000L
      prevTimer.filter(_ != newTimer).foreach(getHandle.deleteTimer)
      if (!prevTimer.contains(newTimer)) getHandle.registerTimer(newTimer)
      outs.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        state.clear()
        Iterator.single(SessionOut(user, st.sessionSeq, st.nEvents,
          st.lastTsMicros - st.startTsMicros))
      }
    }
  }

  final case class ProfileRow(user_id: Long, event_type: String,
      n_events: Long, last_ts_us: Long)

  /** Streaming per-user activity profile: MapState[event_type -> (count,
    * last-seen)] with point updates — the MapState pattern: sub-keys appear
    * dynamically and each input touches ONE map entry, never rewriting the
    * whole profile (a ValueState[Map] would re-serialize every entry per
    * event; with RocksDB each MapState entry is its own store key). Emits
    * the updated entries per batch (Update mode).
    */
  def streamingUserProfile(events: DataFrame): Dataset[ProfileRow] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    implicit val outEnc: org.apache.spark.sql.Encoder[ProfileRow] =
      Encoders.product[ProfileRow]
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.TIMESTAMP))
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new ProfileProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** The [[streamingUserProfile]] processor. */
  class ProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String, java.sql.Timestamp), ProfileRow] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues}

    @transient private var profile: MapState[String, (Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getMapState("profile", Encoders.STRING,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, String, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[ProfileRow] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, tpe, ts) =>
        val tsUs = ts.getTime * 1000L
        val (n, last) =
          if (profile.containsKey(tpe)) profile.getValue(tpe) else (0L, 0L)
        profile.updateValue(tpe, (n + 1L, math.max(last, tsUs)))
        touched += tpe
      }
      touched.iterator.map { tpe =>
        val (n, last) = profile.getValue(tpe)
        ProfileRow(user, tpe, n, last)
      }
    }
  }

  /** The [[streamingTopK]] processor: bounded sorted list in a ValueState. */
  class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Double), TopKEntry] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var state: ValueState[Array[(Double, Long)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState("topk",
        Encoders.kryo[Array[(Double, Long)]], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[TopKEntry] = {
      val cur = if (state.exists()) state.get() else Array.empty[(Double, Long)]
      // merge batch into the bounded list; ties break on smaller id
      val merged = (cur ++ rows.map(r => (r._3, r._2)))
        .sortBy { case (v, id) => (-v, id) }
        .distinct
        .take(k)
      if (merged.sameElements(cur)) Iterator.empty
      else {
        state.update(merged)
        merged.iterator.zipWithIndex.map { case ((v, id), i) =>
          TopKEntry(key, i + 1, id, v)
        }
      }
    }
  }

  def statefulSessionize(events: Dataset[UserEvent], gapSeconds: Long)(
      implicit enc: org.apache.spark.sql.Encoder[SessionOut],
      stEnc: org.apache.spark.sql.Encoder[UserSessionState])
      : Dataset[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[UserSessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserSessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            if (st.nEvents == 0L || e.tsMicros - st.lastTsMicros > gapUs) {
              if (st.nEvents > 0L)
                out += SessionOut(user, st.sessionSeq, st.nEvents,
                  st.lastTsMicros - st.startTsMicros)
              st = UserSessionState(st.sessionSeq + 1L, e.tsMicros, 1L,
                e.tsMicros)
            } else {
              st = st.copy(lastTsMicros = e.tsMicros, nEvents = st.nEvents + 1L)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class EwmaEvt(event_type: String, ts: java.sql.Timestamp)

  /** Per-type smoothing state: open (periodStartSec -> exact count)
    * pairs awaiting watermark closure, the last period already folded
    * (Long.MinValue before any), and the running EWMA.
    */
  final case class EwmaBuf(pending: Seq[(Long, Long)],
      emittedThrough: Long, ewma: Double, hasEwma: Boolean)

  final case class EwmaBar(event_type: String, period_start: Long,
      n: Long, ewma: Double)

  /** Streaming EWMA volume smoothing — the incremental counterpart of
    * [[graft.operators.Anomaly.ewmaSmooth]]. A recurrence cannot emit a
    * period until NO earlier-period event can still arrive (a late count
    * change would rewrite every later smoothed value), so per-type state
    * buffers one exact count per OPEN period and an event-time timer
    * folds periods into the running EWMA strictly in period order once
    * the watermark passes their end — exactness under late data by
    * construction, the streamingFunnel discipline. State per type is
    * O(open periods) — bounded by the watermark horizon / period, never
    * event volume. Rows older than an already-folded period (possible:
    * flatMapGroupsWithState does not auto-drop post-watermark stragglers
    * the way aggregations do) are DROPPED, matching what a windowed
    * aggregation would have done.
    *
    * Arithmetic is the batch kernel's verbatim (`alpha·n + (1−alpha)·e`,
    * seeded at the first observed period; 6dp HALF_UP at emit), so a
    * closed period's bar is bit-identical to the batch operator's row —
    * parity-spec'd.
    */
  def streamingEwma(events: DataFrame, periodSeconds: Long = 3600L,
      alpha: Double = 0.2, watermark: String = "2 hours")
      : Dataset[EwmaBar] = {
    import org.apache.spark.sql.Encoders
    require(periodSeconds > 0 && alpha > 0.0 && alpha <= 1.0,
      "need a positive period and alpha in (0, 1]")
    implicit val evEnc = Encoders.product[EwmaEvt]
    implicit val stEnc = Encoders.product[EwmaBuf]
    implicit val outEnc = Encoders.product[EwmaBar]
    events
      .withWatermark("ts", watermark)
      .select(col("event_type"), col("ts")).as[EwmaEvt]
      .groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState[EwmaBuf, EwmaBar](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[EwmaEvt], state: GroupState[EwmaBuf]) =>
          def fold(st: EwmaBuf, wmMs: Long): (EwmaBuf, Iterator[EwmaBar]) = {
            val (closed, open) = st.pending.partition { case (p, _) =>
              (p + periodSeconds) * 1000L <= wmMs
            }
            var e = st.ewma
            var has = st.hasEwma
            var thru = st.emittedThrough
            val bars = closed.sortBy(_._1).map { case (p, n) =>
              e = if (!has) n.toDouble else alpha * n + (1.0 - alpha) * e
              has = true
              thru = p
              EwmaBar(k, p,
                n, BigDecimal(e).setScale(6,
                  BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
            (EwmaBuf(open, thru, e, has), bars.iterator)
          }
          def arm(st: EwmaBuf): Unit =
            if (st.pending.nonEmpty) {
              val next = st.pending.map(_._1).min
              state.setTimeoutTimestamp(math.max(
                (next + periodSeconds) * 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            }
          if (state.hasTimedOut) {
            val (st, bars) = fold(state.get, state.getCurrentWatermarkMs())
            if (st.pending.isEmpty && !st.hasEwma) state.remove()
            else { state.update(st); arm(st) }
            bars
          } else {
            val st0 = state.getOption
              .getOrElse(EwmaBuf(Seq.empty, Long.MinValue, 0.0, false))
            val counts = scala.collection.mutable.Map(st0.pending: _*)
            it.foreach { e =>
              val p = Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L),
                periodSeconds) * periodSeconds
              // straggler past an already-folded period: drop
              if (p > st0.emittedThrough)
                counts(p) = counts.getOrElse(p, 0L) + 1L
            }
            val st = st0.copy(pending = counts.toSeq)
            state.update(st)
            arm(st)
            Iterator.empty
          }
      }
  }

  final case class FunnelEvt(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** Buffered step events awaiting finalization. `minStep1Us` is
    * Long.MaxValue until the user's first step-1 event arrives; `evs` are
    * (tsMicros, stepIndex) pairs, pruned to the qualifying horizon.
    */
  final case class FunnelBuf(minStep1Us: Long, maxSeenUs: Long,
      evs: Seq[(Long, Int)])

  /** One finalized funnel outcome per user: `reached` = deepest step
    * completed under the greedy earliest-qualifying rule (0 = no step-1
    * event at all); `t*_us` are the chosen instants, -1 when unreached.
    */
  final case class FunnelReach(user_id: Long, reached: Long, t1_us: Long,
      t2_us: Long, t3_us: Long)

  /** The greedy earliest-qualifying chain over buffered (tsMicros, step)
    * events — the SAME rule as the batch [[graft.operators.Funnel]]:
    * step k's chosen instant is the earliest step-k event strictly after
    * the chosen step-(k-1) instant and within `winUs` of it.
    */
  private[streaming] def greedyChain(evs: Seq[(Long, Int)], nSteps: Int,
      winUs: Long): Array[Long] = {
    val chosen = Array.fill(nSteps)(-1L)
    var prev = -1L
    var k = 0
    var go = true
    while (k < nSteps && go) {
      var best = Long.MaxValue
      evs.foreach { case (ts, s) =>
        if (s == k && ts < best &&
            (k == 0 || (ts > prev && ts - prev <= winUs))) best = ts
      }
      if (best == Long.MaxValue) go = false
      else { chosen(k) = best; prev = best; k += 1 }
    }
    chosen
  }

  /** Streaming event funnel: per-user buffered step events, finalized by
    * an event-time timer once the watermark proves the chain's horizon
    * closed — one row per user PER ACTIVITY EPOCH: state is evicted at
    * finalization (keeping per-user tombstones forever would grow state
    * with every user ever seen), so a user whose events resume after
    * their funnel finalized starts a NEW funnel and emits a new outcome
    * row. Batch parity ([[graft.operators.Funnel]], spec'd in
    * `StreamingSpec`) therefore holds per epoch — exactly-once-per-user
    * when each user's activity fits one horizon, which is what the
    * attribution-window contract assumes.
    *
    * Exactness under late data needs buffering, not a (t1,t2,t3) triple:
    * a late-arriving EARLIER step-1 event legally rewrites the whole
    * chain, and a pre-t1 step-2 event may become qualifying when it does
    * — only watermark expiry makes any choice final. State stays bounded:
    * only step-typed events are buffered, events later than
    * `minStep1 + (nSteps-1)·window` can never qualify and are pruned on
    * every update (sound under t1 decreases — the horizon only shrinks),
    * and the timer evicts the whole buffer at
    * `max(minStep1 + horizon, maxSeen) + watermark slack`.
    */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
      windowSeconds: Long, watermark: String = "1 hour")
      : Dataset[FunnelReach] = {
    import org.apache.spark.sql.Encoders
    require(steps.size == 3, "3-step funnel (FunnelReach has 3 slots)")
    implicit val evEnc = Encoders.product[FunnelEvt]
    implicit val stEnc = Encoders.product[FunnelBuf]
    implicit val outEnc = Encoders.product[FunnelReach]
    val stepIdx = steps.zipWithIndex.toMap
    val winUs = windowSeconds * 1000000L
    val horizonUs = (steps.size - 1).toLong * winUs

    events
      .withWatermark("ts", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("ts"), col("event_type")).as[FunnelEvt]
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelBuf, FunnelReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FunnelEvt],
            state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            val c = greedyChain(st.evs, steps.size, winUs)
            Iterator.single(FunnelReach(user,
              c.count(_ >= 0L).toLong, c(0), c(1), c(2)))
          } else {
            var st = state.getOption
              .getOrElse(FunnelBuf(Long.MaxValue, Long.MinValue, Seq.empty))
            // exact micros (getTime alone truncates to ms — the batch
            // funnel compares unix_micros, and window-edge decisions at
            // sub-ms resolution must agree)
            val incoming = it.map { e =>
              (Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
                e.ts.getNanos / 1000L, stepIdx(e.event_type))
            }.toSeq
            val minS1 = incoming.foldLeft(st.minStep1Us) {
              case (m, (ts, 0)) => math.min(m, ts)
              case (m, _) => m
            }
            val maxSeen = incoming.foldLeft(st.maxSeenUs) {
              case (m, (ts, _)) => math.max(m, ts)
            }
            val keep = (st.evs ++ incoming).filter { case (ts, _) =>
              minS1 == Long.MaxValue || ts <= minS1 + horizonUs
            }
            st = FunnelBuf(minS1, maxSeen, keep)
            state.update(st)
            // finalize once the watermark proves no chain event can still
            // arrive: past the horizon end (or past every seen event while
            // no step-1 exists yet)
            val deadlineUs =
              if (minS1 == Long.MaxValue) maxSeen else minS1 + horizonUs
            // a timer must sit strictly above the current watermark
            state.setTimeoutTimestamp(math.max(deadlineUs / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
