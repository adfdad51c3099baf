package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-vt").toString + "/tbl"

  test("init + merge: updates replace, inserts append, version advances") {
    val root = freshRoot()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "value")
    assert(VersionedTable.init(base, root) == 0)
    val updates = Seq((2L, "b2", 25.0), (4L, "d", 40.0))
      .toDF("id", "name", "value")
    assert(VersionedTable.merge(spark, root, updates, Seq("id")) == 1)
    val got = VersionedTable.read(spark, root)
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("time travel: old versions are immutable after later commits") {
    val root = freshRoot()
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
    VersionedTable.init(base, root)
    VersionedTable.merge(spark, root,
      Seq((1L, 99.0)).toDF("id", "value"), Seq("id"))
    VersionedTable.delete(spark, root, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(VersionedTable.latestVersion(spark, root) == 2)
    val v0 = VersionedTable.read(spark, root, Some(0))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(v0 == Seq((1L, 10.0), (2L, 20.0)))
    val v1 = VersionedTable.read(spark, root, Some(1))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(v1 == Seq((1L, 99.0), (2L, 20.0)))
    val v2 = VersionedTable.read(spark, root)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(v2 == Seq((1L, 99.0)))
    assert(VersionedTable.history(spark, root)
      .orderBy("version").as[(Int, Long)].collect().toSeq ==
      Seq((0, 2L), (1, 2L), (2, 1L)))
  }

  test("a stray uncommitted version directory is invisible to readers; " +
      "a FRESH one conflicts (live-competitor window), a STALE one is " +
      "reclaimed") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, 1.0)).toDF("id", "v"), root)
    // simulate a crashed writer: v=1 exists but the pointer was never swapped
    Seq((9L, 9.0)).toDF("id", "v").write.parquet(s"$root/v=1")
    assert(VersionedTable.latestVersion(spark, root) == 0)
    assert(VersionedTable.read(spark, root).count() == 1)
    // a YOUNG unreferenced v=1 is indistinguishable from a LIVE
    // competitor inside its rename->pointer window — deleting it could
    // destroy a commit whose pointer swap is about to land, so the next
    // committer must CONFLICT rather than take the slot
    intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.merge(spark, root, Seq((2L, 2.0)).toDF("id", "v"),
        Seq("id"))
    }
    // aged past the grace window it is provably a crashed writer's
    // leftover: reclaimed, and the commit proceeds cleanly
    val p = new org.apache.hadoop.fs.Path(s"$root/v=1")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.setTimes(p, System.currentTimeMillis - 10 * 60 * 1000L, -1)
    VersionedTable.merge(spark, root, Seq((2L, 2.0)).toDF("id", "v"),
      Seq("id"))
    assert(VersionedTable.latestVersion(spark, root) == 1)
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (2L, 2.0)))
  }

  test("merge default is GROUP-REPLACE on multisets; requireUniqueKeys " +
      "switches to Delta/Iceberg multi-match error semantics") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, "a"), (2L, "old"), (2L, "old2"))
      .toDF("id", "v"), root)
    // default: the whole id=2 group is replaced by the whole update
    // group — well-defined when neither side is key-unique (the
    // synthetic lineitem is not; x49's oracle pins this contract)
    VersionedTable.merge(spark, root,
      Seq((2L, "b"), (2L, "b2")).toDF("id", "v"), Seq("id"))
    assert(VersionedTable.read(spark, root).orderBy("id", "v")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (2L, "b2")))
    // strict: consumers whose math needs a keyed table fail loudly
    val ex = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, root,
        Seq((3L, "c"), (3L, "c2")).toDF("id", "v"), Seq("id"),
        requireUniqueKeys = true)
    }
    assert(ex.getMessage.contains("multiple rows"))
    // the guard fires before any data is staged: table untouched
    assert(VersionedTable.latestVersion(spark, root) == 1)
  }

  test("history after vacuum lists only surviving versions instead of " +
      "throwing on reclaimed paths") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, 1L)).toDF("id", "v"), root)
    (2 to 4).foreach { i =>
      VersionedTable.merge(spark, root,
        Seq((i.toLong, i.toLong)).toDF("id", "v"), Seq("id"))
    }
    VersionedTable.vacuum(spark, root, keepVersions = 1) // drops v0, v1
    val hist = VersionedTable.history(spark, root)
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(hist == Seq((2, 3L), (3, 4L)))
  }

  test("partition values needing hive escaping still prune to the " +
      "right directory (writer escapes, the prefix must too)") {
    val root = freshRoot()
    val df = Seq(("a/b", 1L, 10L), ("a/b", 2L, 20L), ("c:d", 3L, 30L))
      .toDF("p", "id", "v")
    VersionedTable.init(df, root,
      statsColumns = Seq("id"), partitionBy = Seq("p"))
    val got = VersionedTable.readRange(spark, root, "id", 0L, 100L,
      partitionValues = Seq("p" -> "a/b"))
    // a raw-toString prefix ("p=a/b/") matches NO files of the escaped
    // directory (p=a%2Fb) and silently returned an empty frame
    assert(got.count() == 2)
    assert(got.agg(sum("v")).as[Long].collect()(0) == 30L)
  }

  test("merge evolves the schema: new update columns null-fill old rows") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, "a")).toDF("id", "name"), root)
    VersionedTable.merge(spark, root,
      Seq((2L, "b", 0.9)).toDF("id", "name", "score"), Seq("id"))
    val got = VersionedTable.read(spark, root).orderBy("id")
      .select("id", "name", "score")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some(0.9))))
  }

  test("a stale expectedVersion merge throws instead of losing the race") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, "a")).toDF("id", "v"), root)
    // writer A reads v0... writer B commits first (0 -> 1)
    VersionedTable.merge(spark, root, Seq((2L, "b")).toDF("id", "v"),
      Seq("id"))
    // A's CAS-style commit against its stale base must fail loudly
    val ex = intercept[VersionedTable.ConcurrentCommitException] {
      VersionedTable.merge(spark, root, Seq((3L, "c")).toDF("id", "v"),
        Seq("id"), expectedVersion = Some(0))
    }
    assert(ex.getMessage.contains("stale"))
    // B's committed row survived; A's retry on the new latest succeeds
    VersionedTable.merge(spark, root, Seq((3L, "c")).toDF("id", "v"),
      Seq("id"), expectedVersion = Some(1))
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("compact rewrites many small files into one, data unchanged") {
    val root = freshRoot()
    VersionedTable.init(
      spark.range(100).repartition(10).select($"id", ($"id" * 2).as("v")),
      root)
    def files(v: Int): Int = new java.io.File(s"$root/v=$v")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(0) == 10)
    val v1 = VersionedTable.compact(spark, root, numFiles = 1)
    assert(v1 == 1 && files(1) == 1)
    assert(VersionedTable.read(spark, root).orderBy("id")
      .as[(Long, Long)].collect().toSeq ==
      (0L until 100L).map(i => (i, i * 2)))
  }

  test("file stats skip: clustered table prunes most files for a narrow " +
      "range, pruned read equals unpruned filter") {
    val root = freshRoot()
    val base = spark.range(10000)
      .select($"id", ($"id" % 97).as("payload"))
      .repartitionByRange(10, $"id")
      .sortWithinPartitions("id")
    VersionedTable.init(base, root, statsColumns = Seq("id"))
    // narrow range: at most 2 of 10 range-clustered files can span it
    val (kept, total) = VersionedTable.pruneCounts(spark, root, "id",
      2000, 2500)
    assert(total == 10, s"expected 10 files, got $total")
    assert(kept >= 1 && kept <= 2, s"skip ratio broken: $kept/$total")
    val pruned = VersionedTable.readRange(spark, root, "id", 2000, 2500)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val full = VersionedTable.read(spark, root)
      .filter($"id".between(2000, 2500))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(pruned == full && pruned.size == 501)
  }

  test("file stats survive merge and are rebuilt tight by recluster") {
    val root = freshRoot()
    val base = spark.range(10000).select($"id", lit(1L).as("v"))
      .repartitionByRange(10, $"id").sortWithinPartitions("id")
    VersionedTable.init(base, root, statsColumns = Seq("id"))
    VersionedTable.merge(spark, root,
      spark.range(50).select(($"id" * 200).as("id"), lit(2L).as("v")),
      Seq("id"))
    // v1 keeps stats (commit-maintained) and stays CORRECT even though the
    // merge scrambled clustering; values must match the logical filter
    val v1 = VersionedTable.readRange(spark, root, "id", 100, 300,
      Some(1)).agg(sum($"v")).head().getLong(0)
    assert(v1 == 202L) // 201 rows of v=1 plus one merged row upgraded to 2
    VersionedTable.recluster(spark, root, "id", partitions = 10)
    val (kept2, total2) = VersionedTable.pruneCounts(spark, root, "id",
      100, 300, Some(2))
    assert(total2 == 10 && kept2 <= 2,
      s"recluster did not restore skipping: $kept2/$total2")
    val v2 = VersionedTable.readRange(spark, root, "id", 100, 300, Some(2))
      .agg(sum($"v")).head().getLong(0)
    assert(v2 == v1)
  }

  test("readRange on an empty pruning result returns zero rows, not " +
      "an error") {
    val root = freshRoot()
    VersionedTable.init(
      spark.range(100).select($"id", $"id".as("v"))
        .repartitionByRange(4, $"id").sortWithinPartitions("id"),
      root, statsColumns = Seq("id"))
    assert(VersionedTable.readRange(spark, root, "id", 5000, 6000)
      .count() == 0)
  }

  test("partitioned layout: merge round trip, partition filter prunes " +
      "directories at the scan") {
    val root = freshRoot()
    val base = spark.range(1000)
      .select($"id", ($"id" % 5).as("p"), lit(1L).as("v"))
    VersionedTable.init(base, root, partitionBy = Seq("p"))
    // layout check: hive-style partition directories exist
    val dirs = new java.io.File(s"$root/v=0").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("p=")).sorted
    assert(dirs.length == 5, s"expected 5 partition dirs, got ${dirs.toSeq}")
    VersionedTable.merge(spark, root,
      Seq((5000L, 2L, 9L)).toDF("id", "p", "v"), Seq("id"))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 1001)
    assert(got.filter($"p" === 2).count() == 201)
    // the partition predicate must land in PartitionFilters (directory
    // pruning), not as a data filter over a full scan
    val plan = got.filter($"p" === 2).queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*p#.*"),
      plan.take(2000))
  }

  test("dynamic partition pruning engages on a dim-filtered join against " +
      "the versioned fact") {
    val root = freshRoot()
    val fact = spark.range(10000)
      .select($"id", ($"id" % 20).as("p"), ($"id" * 2).as("v"))
    VersionedTable.init(fact, root, partitionBy = Seq("p"))
    val dim = spark.range(20)
      .select($"id".as("p"), concat(lit("g"), $"id" % 4).as("grp"))
    val q = VersionedTable.read(spark, root)
      .join(dim.filter($"grp" === "g0"), Seq("p"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(2000))
    assert(q.count() == 2500)
  }

  test("stats and partitioning compose: file column carries the " +
      "partition-relative path") {
    val root = freshRoot()
    VersionedTable.init(
      spark.range(1000).select($"id", ($"id" % 4).as("p")),
      root, statsColumns = Seq("id"), partitionBy = Seq("p"))
    val files = VersionedTable.fileStats(spark, root)
      .select("file").collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.startsWith("p=")), files.toSeq)
    val pruned = VersionedTable.readRange(spark, root, "id", 100, 200)
    assert(pruned.count() == 101)
    // partition column survives a leaf-file read via basePath
    assert(pruned.columns.contains("p"))
  }

  test("partitionValues composes static partition pruning with the stats index") {
    val root = freshRoot()
    // 4 partitions x range-clustered ids: both prune axes populated
    VersionedTable.init(
      spark.range(1000).select($"id", ($"id" % 4).as("p"))
        .repartitionByRange(5, $"id").sortWithinPartitions("id"),
      root, statsColumns = Seq("id"), partitionBy = Seq("p"))
    val composed = VersionedTable.readRange(spark, root, "id", 100, 200,
      partitionValues = Seq("p" -> 2))
    // rows: ids 100..200 with id % 4 == 2 -> 102, 106, ..., 198 = 25
    assert(composed.count() == 25)
    val (readBoth, total) = VersionedTable.pruneCounts(spark, root,
      "id", 100, 200, partitionValues = Seq("p" -> 2))
    val (readStats, _) = VersionedTable.pruneCounts(spark, root,
      "id", 100, 200)
    assert(readBoth > 0 && readBoth < readStats && readStats < total,
      s"($readBoth, $readStats, $total)")
    // no-stats fallback still applies both predicates row-wise
    val root2 = freshRoot()
    VersionedTable.init(
      spark.range(1000).select($"id", ($"id" % 4).as("p")),
      root2, partitionBy = Seq("p"))
    assert(VersionedTable.readRange(spark, root2, "id", 100, 200,
      partitionValues = Seq("p" -> 2)).count() == 25)
    // an out-of-prefix partition value (second key without the first)
    // degrades to row filtering: same rows, no partition-axis pruning
    val root3 = freshRoot()
    VersionedTable.init(
      spark.range(1000).select($"id", ($"id" % 4).as("p"), ($"id" % 2).as("q"))
        .repartitionByRange(5, $"id").sortWithinPartitions("id"),
      root3, statsColumns = Seq("id"), partitionBy = Seq("p", "q"))
    val degraded = VersionedTable.readRange(spark, root3, "id", 100, 200,
      partitionValues = Seq("q" -> 1))
    assert(degraded.count() == 50) // odd ids in 100..200
    val (readDeg, _) = VersionedTable.pruneCounts(spark, root3,
      "id", 100, 200, partitionValues = Seq("q" -> 1))
    val (readStats3, _) = VersionedTable.pruneCounts(spark, root3,
      "id", 100, 200)
    assert(readDeg == readStats3,
      "out-of-prefix values must not file-prune (stats axis only)")
  }

  test("readRange/pruneCounts degrade to a plain filtered read when a " +
      "version has no usable stats") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, 5.0), (2L, 15.0)).toDF("id", "score"),
      root, statsColumns = Seq("score"))
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a version committed without the configured stats column
    // (merge schema evolution legitimately produces one): no _stats dir
    fsys.delete(new org.apache.hadoop.fs.Path(s"$root/v=0/_stats"), true)
    assert(VersionedTable.readRange(spark, root, "score", 0.0, 10.0)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    val (kept, total) = VersionedTable.pruneCounts(
      spark, root, "score", 0.0, 10.0)
    assert(kept == total) // no-skip fallback, not an exception
    // _stats present but missing min_/max_ for the column: same fallback
    Seq(("part-0.parquet", 2L)).toDF("file", "n_rows")
      .write.mode("overwrite").parquet(s"$root/v=0/_stats")
    assert(VersionedTable.readRange(spark, root, "score", 0.0, 10.0)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("stats pruning survives a table rooted under a directory named " +
      "like v=N") {
    val root = java.nio.file.Files.createTempDirectory("graft-vtv")
      .toString + "/v=2/tbl"
    VersionedTable.init(Seq((1L, 5.0), (2L, 15.0)).toDF("id", "score"),
      root, statsColumns = Seq("score"))
    // a pattern-based strip would split at the parent /v=2/ and record
    // file paths that readRange cannot resolve
    val files = VersionedTable.fileStats(spark, root)
      .select("file").collect().map(_.getString(0))
    assert(files.forall(f => !f.contains("/") || f.startsWith("p=")),
      files.toSeq)
    assert(VersionedTable.readRange(spark, root, "score", 0.0, 10.0)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    // and through a staged commit (merge) too
    VersionedTable.merge(spark, root,
      Seq((3L, 25.0)).toDF("id", "score"), Seq("id"))
    assert(VersionedTable.readRange(spark, root, "score", 20.0, 30.0)
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("vacuum drops versions outside the time-travel window") {
    val root = freshRoot()
    VersionedTable.init(Seq((1L, 1.0)).toDF("id", "v"), root)
    (2 to 4).foreach { i =>
      VersionedTable.merge(spark, root, Seq((i.toLong, i.toDouble))
        .toDF("id", "v"), Seq("id"))
    }
    VersionedTable.vacuum(spark, root, keepVersions = 1)
    // latest (3) and latest-1 (2) survive; 0 and 1 are gone
    assert(VersionedTable.read(spark, root, Some(3)).count() == 4)
    assert(VersionedTable.read(spark, root, Some(2)).count() == 3)
    intercept[Exception] {
      VersionedTable.read(spark, root, Some(0)).count()
    }
  }

  test("bloom point lookup: files without the value skip, values equal " +
      "the plain read, and the index survives merge commits") {
    val root = freshRoot()
    // 4 files of disjoint ids; "tag" values deliberately uncorrelated
    // with the id clustering (the case min/max cannot prune)
    val base = (0L until 400L).map(i => (i, s"tag${i % 97}"))
      .toDF("id", "tag")
      .repartitionByRange(4, col("id"))
    VersionedTable.init(base, root, statsColumns = Seq("id"),
      bloomColumns = Seq("tag"))
    // a tag present in exactly one row -> at most 1 + fp files read
    VersionedTable.merge(spark, root,
      Seq((1000L, "unique-needle")).toDF("id", "tag"), Seq("id"))
    val (read, total) = VersionedTable.bloomPruneCounts(spark, root,
      "tag", "unique-needle")
    assert(total >= 4 && read < total,
      s"expected a strict skip, got $read/$total")
    val got = VersionedTable.readPoint(spark, root, "tag", "unique-needle")
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1000L))
    // absent value: zero rows, never an error; bloom may read 0 files
    assert(VersionedTable.readPoint(spark, root, "tag", "no-such").count()
      === 0L)
    // no-index column degrades to a plain read with (total, total)
    val (r2, t2) = VersionedTable.bloomPruneCounts(spark, root, "id", 7L)
    assert(r2 === t2)
  }

  test("bloom probe hashes at the COLUMN type: an Int-typed probe " +
      "against a bigint column must not false-negative") {
    val root = freshRoot()
    val base = (0L until 100L).map(i => (i, i * 10)).toDF("id", "v")
    VersionedTable.init(base, root, bloomColumns = Seq("v"))
    // 570 exists as a LONG; probe with a plain Int
    val got = VersionedTable.readPoint(spark, root, "v", 570)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(57L))
  }

  test("changeFeed: inserts, deletes, and both update images; " +
      "unchanged rows emit nothing") {
    val root = freshRoot()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "value")
    VersionedTable.init(base, root)
    // v1: update id=2, insert id=4
    VersionedTable.merge(spark, root,
      Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("id", "name", "value"),
      Seq("id"))
    // v2: delete id=3
    VersionedTable.delete(spark, root, Seq(Tuple1(3L)).toDF("id"),
      Seq("id"))
    val feed = VersionedTable.changeFeed(spark, root, 0, 2, Seq("id"))
      .orderBy("_change_type", "id")
      .as[(String, Long, String, Double)].collect().toSeq
    assert(feed === Seq(
      ("delete", 3L, "c", 30.0),
      ("insert", 4L, "d", 40.0),
      ("update_postimage", 2L, "b2", 25.0),
      ("update_preimage", 2L, "b", 20.0)))
    // id=1 untouched -> absent; feed is direction-sensitive
    val reverse = VersionedTable.changeFeed(spark, root, 2, 0, Seq("id"))
    assert(reverse.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("changeFeed drives incremental aggregate maintenance: retract " +
      "preimages, add postimages, equal the full recompute") {
    val root = freshRoot()
    val base = (0L until 50L).map(i => (i, s"g${i % 3}", i.toDouble))
      .toDF("id", "g", "v")
    VersionedTable.init(base, root)
    val agg0 = VersionedTable.read(spark, root, Some(0))
      .groupBy("g").agg(sum("v").as("s"))
      .as[(String, Double)].collect().toMap
    // a merge (update id=4 within g1, insert id=100 into g2) and a
    // delete (id=9 from g0)
    VersionedTable.merge(spark, root,
      Seq((4L, "g1", 40.0), (100L, "g2", 7.5)).toDF("id", "g", "v"),
      Seq("id"))
    VersionedTable.delete(spark, root, Seq(Tuple1(9L)).toDF("id"),
      Seq("id"))
    // maintain: postimages and inserts ADD, preimages and deletes RETRACT
    val deltas = VersionedTable.changeFeed(spark, root, 0, 2, Seq("id"))
      .select(col("g"), when(col("_change_type").isin(
          "insert", "update_postimage"), col("v"))
        .otherwise(-col("v")).as("d"))
      .groupBy("g").agg(sum("d").as("d"))
      .as[(String, Double)].collect().toMap
    val maintained = (agg0.keySet ++ deltas.keySet).map(g =>
      g -> (agg0.getOrElse(g, 0.0) + deltas.getOrElse(g, 0.0))).toMap
    val recomputed = VersionedTable.read(spark, root)
      .groupBy("g").agg(sum("v").as("s"))
      .as[(String, Double)].collect().toMap
    assert(maintained.keySet === recomputed.keySet)
    recomputed.foreach { case (g, s) =>
      assert(math.abs(maintained(g) - s) < 1e-9, g)
    }
  }

  test("changeFeed: null-safe diff — a null turning non-null (and the " +
      "reverse) is an update, null keys join as equal") {
    val root = freshRoot()
    val base = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "name")
    VersionedTable.init(base, root)
    VersionedTable.merge(spark, root,
      Seq((1L, Option("now")), (2L, Option.empty[String]))
        .toDF("id", "name"), Seq("id"))
    val feed = VersionedTable.changeFeed(spark, root, 0, 1, Seq("id"))
    assert(feed.filter(col("_change_type").startsWith("update")).count()
      === 4L)
    assert(feed.count() === 4L)
  }

  test("scd2History: per-key version intervals — updates split runs, " +
      "deletes close them, re-inserts open new ones, an unchanged key " +
      "spans the whole range with ver_to null") {
    val root = freshRoot()
    // id 1: unchanged throughout; id 2: updated at v2; id 3: deleted at
    // v1, re-inserted at v3 with a new image; id 4: inserted at v2
    VersionedTable.init(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"), root)
    VersionedTable.delete(spark, root,
      Seq(Tuple1(3L)).toDF("id"), Seq("id")) // v1
    VersionedTable.merge(spark, root,
      Seq((2L, "b2"), (4L, "d")).toDF("id", "name"), Seq("id")) // v2
    VersionedTable.merge(spark, root,
      Seq((3L, "c3")).toDF("id", "name"), Seq("id")) // v3
    val got = VersionedTable.scd2History(spark, root, Seq("id"))
      .orderBy("id", "ver_from")
      .select("id", "name", "ver_from", "ver_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, "a", 0, -1),   // never touched: current since v0
      (2L, "b", 0, 1),    // old image held v0..v1
      (2L, "b2", 2, -1),  // new image current since v2
      (3L, "c", 0, 0),    // deleted at v1: run closes at v0
      (3L, "c3", 3, -1),  // re-insert opens a NEW run
      (4L, "d", 2, -1)),  // late insert
      s"unexpected intervals: $got")
    // composition law: the asOf slice at each version equals that
    // version's snapshot — intervals ARE the version history
    val latest = VersionedTable.latestVersion(spark, root)
    val hist = VersionedTable.scd2History(spark, root, Seq("id"))
    (0 to latest).foreach { v =>
      val slice = hist.filter(col("ver_from") <= v &&
          (col("ver_to").isNull || col("ver_to") >= v))
        .select("id", "name").orderBy("id")
        .as[(Long, String)].collect().toSeq
      val snap = VersionedTable.read(spark, root, Some(v))
        .select("id", "name").orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(slice == snap, s"asOf slice at v$v diverged from snapshot")
    }
  }
}
