package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RawLocalFileSystem whose setTimes throws, under scheme `notimes://`:
  * models the object-store filesystems that refuse mtime updates —
  * several surface the refusal as a plain IOException, not
  * UnsupportedOperationException, so a setTimes-based lease refresh
  * would kill every fold there. The writer lease must stay live through
  * create+list+delete alone.
  */
class NoSetTimesFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("notimes:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long,
      atime: Long): Unit =
    throw new java.io.IOException(
      "setTimes is not supported by the notimes:// store")
}

/** RawLocalFileSystem registered under scheme `s3a://` whose rename is a
  * FAITHFUL copy+delete (a window where src and dst both exist): models
  * the object-store class where neither create-no-overwrite nor
  * rename-as-CAS is exclusive, so the writer lock's acquire/takeover
  * primitives could split-brain under a race. The protocol must refuse
  * a lock root on such a scheme, not gamble on it.
  */
class CopyRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (!exists(src)) return false
    org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      false, getConf)
    delete(src, true)
    true
  }
}

/** Atomicity laws of the incremental-dedup three-table state commit
  * (the manifest-flip protocol): a fold that crashes at ANY point
  * between its state writes leaves readers exactly the pre-fold state,
  * a retry converges to the clean-run result, a tag-matched replay of a
  * fully-committed fold is skipped whole, and compaction no longer has
  * the drop+RENAME window where the counts table went missing.
  */
class IncrementalStateCommitSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDup = base.replace("today", "tonight")
  private def batch1 = Seq(
    (0L, base),
    (1L, base),
    (2L, nearDup),
    (3L, "completely different content about spark query engines and scale")
  ).toDF("doc_id", "text")
  private def batch2 = Seq(
    (10L, base), // history dup of 0
    (11L, nearDup.replace("river", "creek")),
    (12L, "novel second-batch content with entirely fresh vocabulary"),
    (13L, "novel second-batch content with entirely fresh vocabulary")
  ).toDF("doc_id", "text")

  private def fold(df: org.apache.spark.sql.DataFrame, prefix: String,
      crashAfter: Int = Int.MaxValue,
      tag: Option[String] = None): Set[Long] = {
    val s = Dedup.incrementalMinhashDedupImpl(df, prefix, "text", "doc_id",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.6,
      seed = 42L, buckets = 2, maxBucketSize = 1000, foldTag = tag,
      crashAfterWrites = crashAfter)
    val ids = s.select("doc_id").as[Long].collect().toSet
    s.unpersist()
    ids
  }

  private def stateSnapshot(prefix: String): Map[String, Set[String]] =
    Seq("_bands", "_shingles", "_bucket_counts").map { suf =>
      val t = s"$prefix$suf"
      // key on the SUFFIX so snapshots compare across prefixes
      suf -> (if (!spark.catalog.tableExists(t)) Set.empty[String]
        else spark.table(t).collect().map(_.toString).toSet)
    }.toMap

  test("a fold crash at EVERY write interleaving point leaves readers " +
      "the pre-fold state, and the retry converges to the clean run") {
    // clean reference on its own prefix: two folds, no crash
    val ref = s"iscref_${System.nanoTime()}"
    val refS1 = fold(batch1, ref)
    val refS2 = fold(batch2, ref)
    val refState = stateSnapshot(ref)
    try {
      // k = 0: crash before any append; 1: after bands; 2: after bands +
      // shingles; 3: after all three appends but BEFORE the manifest flip
      for (k <- 0 to 3) {
        val p = s"isc${k}_${System.nanoTime()}"
        try {
          assert(fold(batch1, p) == refS1)
          val committed = stateSnapshot(p)
          val ex = intercept[IllegalStateException](fold(batch2, p,
            crashAfter = k))
          assert(ex.getMessage.contains("injected crash"))
          // reader law: after the sweep (any state entry runs it), the
          // three tables hold EXACTLY the pre-fold content — no torn
          // subset of the crashed fold's appends is observable
          Dedup.syncStateToManifest(spark, p)
          assert(stateSnapshot(p) == committed,
            s"k=$k: torn state visible after crash")
          // retry law: re-running the fold gives the clean-run survivors
          // AND the clean-run state, bit-for-bit at the row level
          assert(fold(batch2, p) == refS2, s"k=$k: retry diverged")
          assert(stateSnapshot(p) == refState,
            s"k=$k: retried state diverged from the clean run")
        } finally Dedup.dropIncrementalDedupState(spark, p)
      }
    } finally Dedup.dropIncrementalDedupState(spark, ref)
  }

  test("a tag-matched replay of a fully-committed fold is skipped whole: " +
      "same survivors, zero new state rows or files") {
    val p = s"isctag_${System.nanoTime()}"
    try {
      val s1 = fold(batch1, p, tag = Some("b1"))
      val s2 = fold(batch2, p, tag = Some("b2"))
      val committed = stateSnapshot(p)
      val bandRows = spark.table(s"${p}_bands").count()
      // the crash-after-flip window: the caller never recorded the fold
      // as done and replays it with the same tag — the state must not
      // double-append (double _bucket_counts rows would double occupancy
      // and can flip the hot-bucket guard near the cap)
      val replay = fold(batch2, p, tag = Some("b2"))
      assert(replay == s2, "replay survivors diverged")
      assert(stateSnapshot(p) == committed, "replay mutated state")
      assert(spark.table(s"${p}_bands").count() == bandRows)
      // a NEXT fold with a fresh tag folds normally, and the full
      // incremental run (including the replayed fold) still equals the
      // one-shot greedy dedup over everything
      val batch3 = Seq((20L, base.replace("dog", "wolf")),
        (21L, "third batch about glaciers and ice floes entirely fresh"))
        .toDF("doc_id", "text")
      val s3 = fold(batch3, p, tag = Some("b3"))
      val oneShot = Dedup.minhashDedup(
        batch1.unionByName(batch2).unionByName(batch3), "text", "doc_id",
        threshold = 0.6).select("doc_id").as[Long].collect().toSet
      assert((s1 ++ s2 ++ s3) == oneShot,
        s"incremental-with-replay ${s1 ++ s2 ++ s3} != one-shot $oneShot")
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("compaction commits through the manifest with a one-generation " +
      "retention window: the superseded deltas stay on disk (a reader's " +
      "pre-flip scan plan still executes) until the next sweep reclaims " +
      "them; snapshot reads during the window are single-counted; a " +
      "stranded compaction append is swept — never double-counted") {
    val p = s"isccomp_${System.nanoTime()}"
    try {
      fold(batch1, p)
      fold(batch2, p)
      val countsT = s"${p}_bucket_counts"
      def occupancy = spark.table(countsT).groupBy("__bkey")
        .agg(sum("__bcnt").as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def snapshotOccupancy = Dedup.readBucketCounts(spark, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def diskFiles: Set[String] = {
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            spark.sessionState.sqlParser.parseTableIdentifier(countsT))
            .location)
        val fsys = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fsys.listStatus(loc).map(_.getPath.getName)
          .filter(_.startsWith("part-")).toSet
      }
      val beforeCompact = occupancy
      // a concurrent reader plans its scan NOW (captures the pre-flip
      // file list), then the compaction flips underneath it
      val preFlipFiles = diskFiles
      val preFlipScan = spark.read.parquet(preFlipFiles.toSeq.sorted.map(
        n => new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            spark.sessionState.sqlParser.parseTableIdentifier(countsT))
            .location.toString, n).toString): _*)
      Dedup.compactBucketCounts(spark, p, buckets = 2)
      // retention: every pre-flip file is still on disk, so the reader's
      // in-flight scan completes with the pre-compaction content
      assert((preFlipFiles -- diskFiles).isEmpty,
        "compaction deleted files inside the retention window")
      val readerSees = preFlipScan.groupBy("__bkey")
        .agg(sum("__bcnt").as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(readerSees == beforeCompact,
        "pre-flip reader saw torn occupancy across the compaction")
      // snapshot reads during the window single-count (the raw directory
      // deliberately holds both generations until the sweep)
      assert(snapshotOccupancy == beforeCompact,
        "snapshot read double-counted inside the retention window")
      // the next sweep ends the window: retired deltas reclaimed, the
      // table collapses to one row per key with unchanged occupancy
      Dedup.syncStateToManifest(spark, p)
      assert(occupancy == beforeCompact, "compaction changed occupancy")
      assert((diskFiles -- preFlipFiles).nonEmpty &&
        (preFlipFiles & diskFiles).isEmpty,
        "sweep failed to reclaim the retired delta generation")
      val ct = spark.table(countsT)
      assert(ct.count() == ct.select("__bkey").distinct().count(),
        "compaction must leave one row per key")
      // emulate a compaction that crashed between its append and its
      // manifest flip: stranded total-rows files sit in the directory
      // unlisted. A naive reader would see DOUBLE occupancy; the sweep
      // must reclaim them before any read.
      val stranded = occupancy
      spark.table(countsT).groupBy("__bkey")
        .agg(sum("__bcnt").as("__bcnt"))
        .repartition(2, col("__bkey"))
        .write.mode("append").bucketBy(2, "__bkey")
        .format("parquet").saveAsTable(countsT)
      assert(occupancy != stranded, "emulated crash should double counts")
      Dedup.syncStateToManifest(spark, p)
      assert(occupancy == stranded,
        "sweep failed to reclaim the stranded compaction append")
      // and the state still folds correctly afterwards
      val s3 = fold(Seq((20L, base.replace("dog", "wolf")),
        (21L, "third batch about glaciers and ice floes entirely fresh"))
        .toDF("doc_id", "text"), p)
      assert(!s3.contains(20L) && s3.contains(21L))
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("a second concurrent writer application is refused loudly before " +
      "it can sweep the lock holder's in-flight appends; the explicit " +
      "break releases the stranded lock of a dead driver") {
    val p = s"isclock_${System.nanoTime()}"
    try {
      fold(batch1, p)
      // plant a token naming a FOREIGN application (a live concurrent
      // writer, or one whose driver died mid-fold)
      val token = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_state_writer")
      val fsys = token.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fsys.create(token, true)
      out.write("someone-else\tdeadbeef".getBytes("UTF-8")); out.close()
      val ex = intercept[IllegalStateException](fold(batch2, p))
      assert(ex.getMessage.contains("locked by writer"))
      // the refusal must not have touched state: the committed fold's
      // tables are intact and the foreign token survives
      assert(fsys.exists(token))
      // operator adjudicates the holder dead and breaks the lock
      Dedup.breakIncrementalDedupWriterLock(spark, p)
      val ref = s"isclockref_${System.nanoTime()}"
      try {
        fold(batch1, ref)
        assert(fold(batch2, p) == fold(batch2, ref),
          "post-break fold diverged from the uninterrupted run")
      } finally Dedup.dropIncrementalDedupState(spark, ref)
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("a foreign token whose lease lapsed (no heartbeat for 3 leases) " +
      "is taken over WITHOUT a manual break, and the fold matches the " +
      "uninterrupted run; a fresh foreign token is still refused") {
    val p = s"isclease_${System.nanoTime()}"
    val leaseKey = "spark.graft.incrementalDedup.writerLeaseSec"
    try {
      fold(batch1, p)
      val token = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_state_writer")
      val fsys = token.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def plantForeign(): Unit = {
        val out = fsys.create(token, true)
        out.write("someone-else\tdeadbeef".getBytes("UTF-8")); out.close()
      }
      spark.conf.set(leaseKey, "1")
      try {
        // fresh foreign token: age 0 < 3x1s lease — refused, not usurped
        plantForeign()
        val ex = intercept[IllegalStateException](fold(batch2, p))
        assert(ex.getMessage.contains("locked by writer"))
        assert(fsys.exists(token), "refusal must not touch the token")
        // age the same token past the takeover threshold: the holder
        // missed every heartbeat for 3 leases — claimable, no human
        fsys.setTimes(token, System.currentTimeMillis() - 4000L, -1)
        val ref = s"iscleaseref_${System.nanoTime()}"
        try {
          fold(batch1, ref)
          assert(fold(batch2, p) == fold(batch2, ref),
            "post-takeover fold diverged from the uninterrupted run")
          // the completed fold released the (taken-over) token
          assert(!fsys.exists(token))
        } finally Dedup.dropIncrementalDedupState(spark, ref)
      } finally spark.conf.unset(leaseKey)
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("the writer lease heartbeats, refuses, and takes over on a store " +
      "whose setTimes THROWS (content heartbeat — no mtime refresh " +
      "anywhere in the protocol), with the lock rooted off-warehouse " +
      "via lockRoot") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.notimes.impl", classOf[NoSetTimesFileSystem].getName)
    val lockDir = java.nio.file.Files
      .createTempDirectory("graft-notimes").toString
    val lockKey = "spark.graft.incrementalDedup.lockRoot"
    val leaseKey = "spark.graft.incrementalDedup.writerLeaseSec"
    val p = s"iscnst_${System.nanoTime()}"
    spark.conf.set(lockKey, s"notimes://$lockDir")
    spark.conf.set(leaseKey, "1")
    try {
      val token = new org.apache.hadoop.fs.Path(
        s"notimes://$lockDir", s"${p}_state_writer")
      val fsys = token.getFileSystem(hconf)
      // the stub really is the store this spec models
      intercept[java.io.IOException](
        fsys.setTimes(token, System.currentTimeMillis(), -1))
      def sidecars() = fsys.listStatus(
        new org.apache.hadoop.fs.Path(s"notimes://$lockDir"))
        .map(_.getPath.getName)
        .filter(_.startsWith(s"${p}_state_writer.hb-")).toSeq
      // a full fold heartbeats at every phase on this store and completes
      val s1 = fold(batch1, p)
      // completed fold released token AND sidecars
      assert(!fsys.exists(token), "fold left its token behind")
      assert(sidecars().isEmpty, "fold leaked heartbeat sidecars")
      // direct heartbeat law: never throws here, and supersession keeps
      // exactly one sidecar alive
      Dedup.acquireStateWriter(spark, p)
      Dedup.heartbeatStateWriter(spark, p)
      Dedup.heartbeatStateWriter(spark, p)
      assert(sidecars().size == 1,
        s"expected one live sidecar after two beats, got ${sidecars()}")
      Dedup.breakIncrementalDedupWriterLock(spark, p)
      assert(sidecars().isEmpty, "release leaked sidecars")
      // liveness without setTimes: a foreign holder's fresh token refuses
      def plantForeign(): Unit = {
        val out = fsys.create(token, true)
        out.write("someone-else\tdeadbeef".getBytes("UTF-8")); out.close()
      }
      plantForeign()
      val ex = intercept[IllegalStateException](fold(batch2, p))
      assert(ex.getMessage.contains("locked by writer"))
      // ... and a fresh SIDEcar naming that holder keeps the lease alive
      // past the token's own age (this is the content heartbeat a live
      // remote writer would be recording on a setTimes-less store)
      Thread.sleep(3300) // token mtime now stale past 3x the 1s lease
      val hb = new org.apache.hadoop.fs.Path(s"notimes://$lockDir",
        s"${p}_state_writer.hb-test")
      val out = fsys.create(hb, true)
      out.write("someone-else".getBytes("UTF-8")); out.close()
      val ex2 = intercept[IllegalStateException](fold(batch2, p))
      assert(ex2.getMessage.contains("locked by writer"),
        "a fresh holder-matching sidecar must keep the foreign lease alive")
      // once the sidecar goes stale too, the takeover claims the lock
      // and the fold matches an uninterrupted run
      Thread.sleep(3300)
      val ref = s"iscnstref_${System.nanoTime()}"
      try {
        spark.conf.unset(lockKey) // ref prefix locks in the warehouse
        fold(batch1, ref)
        val want = fold(batch2, ref)
        spark.conf.set(lockKey, s"notimes://$lockDir")
        assert(fold(batch2, p) == want,
          "post-takeover fold diverged from the uninterrupted run")
        assert(!fsys.exists(token) && sidecars().isEmpty,
          "takeover fold left lock litter behind")
      } finally {
        spark.conf.unset(lockKey)
        Dedup.dropIncrementalDedupState(spark, ref)
        spark.conf.set(lockKey, s"notimes://$lockDir")
      }
      assert(s1 == Set(0L, 3L))
    } finally {
      spark.conf.unset(leaseKey)
      try Dedup.dropIncrementalDedupState(spark, p)
      finally spark.conf.unset(lockKey)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(lockDir))
    }
  }

  test("the mid-fold heartbeat dies loudly when the lock was lost: a " +
      "holder whose lease lapsed and was usurped must abort, not keep " +
      "writing over the new holder's state") {
    val p = s"ischb_${System.nanoTime()}"
    try {
      fold(batch1, p)
      val token = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_state_writer")
      val fsys = token.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a contender holds the lock now (we were usurped mid-fold)
      val out = fsys.create(token, true)
      out.write("usurper-app\tcafe".getBytes("UTF-8")); out.close()
      val ex = intercept[IllegalStateException](
        Dedup.heartbeatStateWriter(spark, p))
      assert(ex.getMessage.contains("lost mid-fold"))
      // the vanished-token case is equally fatal (manual break mid-fold)
      fsys.delete(token, false)
      val ex2 = intercept[IllegalStateException](
        Dedup.heartbeatStateWriter(spark, p))
      assert(ex2.getMessage.contains("lost mid-fold"))
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("an injected crash strands the writer token, and the SAME " +
      "application's retry proceeds without an explicit break (serial " +
      "caller contract)") {
    val p = s"isctok_${System.nanoTime()}"
    try {
      fold(batch1, p)
      intercept[IllegalStateException](fold(batch2, p, crashAfter = 2))
      val token = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_state_writer")
      val fsys = token.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsys.exists(token), "crash should strand the writer token")
      val ref = s"isctokref_${System.nanoTime()}"
      try {
        fold(batch1, ref)
        assert(fold(batch2, p) == fold(batch2, ref))
        // a completed fold releases the token
        assert(!fsys.exists(token))
      } finally Dedup.dropIncrementalDedupState(spark, ref)
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("pre-manifest legacy state (tables, no manifest, no protocol " +
      "marker) is never silently reclaimed: the fold fails loudly, and " +
      "adoptIncrementalDedupState migrates it with history preserved") {
    val p = s"isclegacy_${System.nanoTime()}"
    try {
      fold(batch1, p)
      // strip the protocol's bookkeeping, leaving exactly the pre-r16
      // layout: three committed tables, nothing else
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val fsys = new org.apache.hadoop.fs.Path(warehouse)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(s"${p}_state_manifest", s"${p}_state_protocol", s"${p}_losers")
        .foreach { n =>
          val path = new org.apache.hadoop.fs.Path(warehouse, n)
          assert(fsys.delete(path, true), s"$n should exist post-fold")
        }
      val ex = intercept[IllegalStateException](fold(batch2, p))
      assert(ex.getMessage.contains("adoptIncrementalDedupState"))
      // history must be intact after the refusal
      assert(spark.table(s"${p}_bands").count() > 0)
      // migrate, then fold: batch2's history dup of doc 0 must still be
      // caught — proof the adopted state kept the accumulated corpus
      Dedup.adoptIncrementalDedupState(spark, p)
      val s2 = fold(batch2, p)
      assert(!s2.contains(10L),
        "adopted state lost the history that makes doc 10 a dup of doc 0")
      assert(s2.contains(12L) && !s2.contains(13L))
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("the tag-matched replay reads the MANIFEST-NAMED loser verdict " +
      "and fails loudly when it is missing, instead of silently reading " +
      "another fold's verdict") {
    val p = s"iscverdict_${System.nanoTime()}"
    try {
      fold(batch1, p, tag = Some("b1"))
      // corrupt: remove the committed verdict dataset out-of-band
      val lroot = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_losers")
      val fsys = lroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsys.delete(lroot, true), "loser root should exist post-fold")
      val ex = intercept[IllegalStateException](
        fold(batch1, p, tag = Some("b1")))
      assert(ex.getMessage.contains("loser verdict"))
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("an empty foldTag is refused: it would equal the placeholder an " +
      "untagged fold records, silently replay-skipping a real fold") {
    val p = s"iscempty_${System.nanoTime()}"
    try intercept[IllegalArgumentException](fold(batch1, p, tag = Some("")))
    finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("a state drop that crashed after removing the manifest leaves " +
      "tables the next fold reclaims as uncommitted — not a loud " +
      "corruption failure") {
    val p = s"iscdrop_${System.nanoTime()}"
    val ref = s"iscdropref_${System.nanoTime()}"
    try {
      fold(batch1, p)
      // a crashed dropIncrementalDedupState deletes the manifest FIRST;
      // emulate dying right after
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val mf = new org.apache.hadoop.fs.Path(warehouse,
        s"${p}_state_manifest")
      val fsys = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fsys.delete(mf, false), "manifest should exist post-fold")
      // the next "first" fold must see pre-state (tables reclaimed whole)
      val want = fold(batch1, ref)
      assert(fold(batch1, p) == want)
      assert(stateSnapshot(p) == stateSnapshot(ref))
    } finally {
      Dedup.dropIncrementalDedupState(spark, p)
      Dedup.dropIncrementalDedupState(spark, ref)
    }
  }

  test("a first fold that crashes before its first manifest flip is " +
      "reclaimed whole: the retry recreates the state from scratch") {
    val p = s"iscfirst_${System.nanoTime()}"
    try {
      val ex = intercept[IllegalStateException](fold(batch1, p,
        crashAfter = 3))
      assert(ex.getMessage.contains("injected crash"))
      // tables exist but no manifest was ever flipped -> uncommitted
      assert(spark.catalog.tableExists(s"${p}_bands"))
      val ref = s"iscfirstref_${System.nanoTime()}"
      try {
        val want = fold(batch1, ref)
        assert(fold(batch1, p) == want, "first-fold retry diverged")
        assert(stateSnapshot(p) == stateSnapshot(ref))
      } finally Dedup.dropIncrementalDedupState(spark, ref)
    } finally Dedup.dropIncrementalDedupState(spark, p)
  }

  test("the heartbeat's supersession sweep reclaims ONLY this holder's " +
      "sidecars: a usurped-but-unaware holder in the TOCTOU window " +
      "between its holder check and its sweep cannot delete the new " +
      "live holder's fresh beats") {
    val p = s"ischfil_${System.nanoTime()}"
    try {
      Dedup.acquireStateWriter(spark, p)
      val dir = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def plant(name: String, holder: String): Unit = {
        val out = fsys.create(
          new org.apache.hadoop.fs.Path(dir, name), true)
        out.write(holder.getBytes("UTF-8")); out.close()
      }
      // the state of the TOCTOU hazard: WE still pass the holder check
      // (token names us), but a new holder's fresh sidecar is already on
      // disk (in the real interleaving the token flips right after our
      // check; the sweep must be safe regardless of token state). Plus
      // one stale sidecar of our own that SHOULD be reclaimed.
      val me = spark.sparkContext.applicationId
      plant(s"${p}_state_writer.hb-new-holder", "new-live-holder-app")
      plant(s"${p}_state_writer.hb-own-stale", me)
      Dedup.heartbeatStateWriter(spark, p)
      val names = fsys.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(s"${p}_state_writer.hb-")).toSet
      assert(names.contains(s"${p}_state_writer.hb-new-holder"),
        "the sweep deleted a FOREIGN holder's sidecar — a usurped " +
          "holder could regress the new live holder's recorded lease")
      assert(!names.contains(s"${p}_state_writer.hb-own-stale"),
        "the sweep must still reclaim this holder's superseded beats")
      assert(names.size == 2,
        s"expected the foreign beat plus exactly one fresh own beat, " +
          s"got $names")
    } finally {
      Dedup.breakIncrementalDedupWriterLock(spark, p)
      Dedup.dropIncrementalDedupState(spark, p)
    }
  }

  test("a writer lock rooted on a copy-rename object store is refused " +
      "at acquire — not silently split-brained — while the lockRoot " +
      "redirect and the explicit serialized-writers escape hatch both " +
      "engage") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[CopyRenameFileSystem].getName)
    val objDir = java.nio.file.Files
      .createTempDirectory("graft-copyrename").toString
    val lockKey = "spark.graft.incrementalDedup.lockRoot"
    val allowKey = "spark.graft.incrementalDedup.allowNonAtomicLockStore"
    val p = s"iscobj_${System.nanoTime()}"
    try {
      // the stub really renames by copy+delete (models the store class)
      val fsys = new org.apache.hadoop.fs.Path(s"s3a://$objDir")
        .getFileSystem(hconf)
      val a = new org.apache.hadoop.fs.Path(s"s3a://$objDir/a")
      val out = fsys.create(a, true)
      out.write("x".getBytes("UTF-8")); out.close()
      assert(fsys.rename(a, new org.apache.hadoop.fs.Path(
        s"s3a://$objDir/b")) && !fsys.exists(a))
      // lock rooted on the object store: refused loudly at acquire,
      // before any state write, with the remedies in the message
      spark.conf.set(lockKey, s"s3a://$objDir")
      val ex = intercept[IllegalStateException](fold(batch1, p))
      assert(ex.getMessage.contains("copy+delete"))
      assert(ex.getMessage.contains("lockRoot"))
      assert(!fsys.exists(new org.apache.hadoop.fs.Path(
        s"s3a://$objDir", s"${p}_state_writer")),
        "a refused acquire must leave no lock litter on the store")
      // remedy 1: redirect the lock (alone) to an atomic-rename store —
      // the fold proceeds with its state tables untouched elsewhere
      val safeLockDir = java.nio.file.Files
        .createTempDirectory("graft-safelock").toString
      spark.conf.set(lockKey, safeLockDir)
      assert(fold(batch1, p) == Set(0L, 3L))
      // remedy 2: the documented escape hatch for externally-serialized
      // writers — folds proceed on the object-store lock, loudly
      spark.conf.set(lockKey, s"s3a://$objDir")
      spark.conf.set(allowKey, "true")
      val ref = s"iscobjref_${System.nanoTime()}"
      try {
        spark.conf.unset(lockKey)
        spark.conf.unset(allowKey)
        fold(batch1, ref)
        val want = fold(batch2, ref)
        spark.conf.set(lockKey, s"s3a://$objDir")
        spark.conf.set(allowKey, "true")
        assert(fold(batch2, p) == want,
          "escape-hatch fold diverged from the uninterrupted run")
      } finally {
        spark.conf.unset(lockKey)
        spark.conf.unset(allowKey)
        Dedup.dropIncrementalDedupState(spark, ref)
      }
    } finally {
      spark.conf.unset(allowKey)
      try Dedup.dropIncrementalDedupState(spark, p)
      finally spark.conf.unset(lockKey)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(objDir))
    }
  }
}
