package graft.tools

import org.apache.spark.sql.SparkSession

/** Subprocess harness for the CROSS-PROCESS incremental-dedup state
  * resume contract (driven by `CrossProcessStateResumeSpec`): each step
  * runs in its own JVM against a PERSISTENT derby metastore + shared
  * warehouse, so the catalog entries for the bucketed state tables
  * survive process death — the deployment the in-JVM crash-injection
  * specs cannot model.
  *
  * Steps (args: `<step> <workDir> <prefix>`):
  *  - `fold1`    — fold batch 1 (tag `b1`), commit, print survivors.
  *  - `crashfold2` — fold batch 2 (tag `b2`) with a crash injected after
  *    2 of the 3 state appends, then `Runtime.halt` the JVM at the
  *    injection point: no shutdown hooks, no cleanup — the filesystem
  *    and metastore are left exactly as a `kill -9` mid-write leaves
  *    them.
  *  - `resume`   — a NEW process (new Spark application id) retries the
  *    batch: it must first be REFUSED by the dead application's writer
  *    token (printed as `REFUSED:true`), then — after the explicit
  *    operator break — fold to exactly the committed pre-crash state
  *    plus batch 2, with the crash's torn appends swept.
  *  - `leaseresume` — a NEW process resumes WITHOUT any manual lock
  *    break: it shrinks the writer lease to 1s, waits out the takeover
  *    threshold against the dead application's stranded token (printed
  *    as `STRANDED:true` first), and folds — the lease-expiry takeover
  *    must fire on its own and the refold must match the committed
  *    history. This is the unattended-pipeline self-heal path.
  *  - `replay`   — another NEW process replays tag `b2`: the manifest
  *    tag match must skip the fold whole (same survivors, zero new
  *    state rows) via the manifest-named loser verdict.
  *
  * Output protocol (parsed by the spec): `SURVIVORS:<csv>`,
  * `BANDROWS:<n>`, `REFUSED:<bool>` lines on stdout.
  */
object StateResumeHarness {
  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDup = base.replace("today", "tonight")

  def main(args: Array[String]): Unit = {
    val Array(step, workDir, prefix) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"state-resume-$step")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .config("spark.sql.catalogImplementation", "hive")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$workDir/metastore_db;create=true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def batch1 = Seq(
      (0L, base), (1L, base), (2L, nearDup),
      (3L, "completely different content about spark query engines and scale")
    ).toDF("doc_id", "text")
    def batch2 = Seq(
      (10L, base), // history dup of doc 0 — only caught if state survived
      (11L, nearDup.replace("river", "creek")),
      (12L, "novel second-batch content with entirely fresh vocabulary"),
      (13L, "novel second-batch content with entirely fresh vocabulary")
    ).toDF("doc_id", "text")

    def fold(df: org.apache.spark.sql.DataFrame, tag: String,
        crashAfter: Int = Int.MaxValue): Set[Long] = {
      val s = graft.operators.Dedup.incrementalMinhashDedupImpl(df, prefix,
        "text", "doc_id", shingleK = 3, numHashes = 64, bands = 16,
        threshold = 0.6, seed = 42L, buckets = 2, maxBucketSize = 1000,
        foldTag = Some(tag), crashAfterWrites = crashAfter)
      val ids = s.select("doc_id").as[Long].collect().toSet
      s.unpersist()
      ids
    }
    def report(survivors: Set[Long]): Unit = {
      println(s"SURVIVORS:${survivors.toSeq.sorted.mkString(",")}")
      println(s"BANDROWS:${spark.table(s"${prefix}_bands").count()}")
    }

    step match {
      case "fold1" =>
        report(fold(batch1, "b1"))
        spark.stop()
      case "crashfold2" =>
        try {
          fold(batch2, "b2", crashAfter = 2)
          System.err.println("crashfold2: injection did not fire")
          sys.exit(1)
        } catch {
          case e: IllegalStateException
              if e.getMessage.contains("injected crash") =>
            // die HERE, with the state torn mid-write: halt() runs no
            // shutdown hooks and flushes nothing — kill -9 semantics at
            // the exact interleaving point
            Runtime.getRuntime.halt(137)
        }
      case "leaseresume" =>
        // unattended self-heal: NO breakIncrementalDedupWriterLock call
        // anywhere in this step. The dead application's token must be
        // present (else the step proves nothing), the lease shrinks to
        // 1s, and once the token has gone 3 missed leases without a
        // heartbeat the fold's acquire takes it over by itself.
        val token = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          s"${prefix}_state_writer")
        val fsys = token.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        println(s"STRANDED:${fsys.exists(token)}")
        spark.conf.set("spark.graft.incrementalDedup.writerLeaseSec", "1")
        val expiry = 3L * 1000L // WriterLeaseMissesForTakeover x 1s lease
        def age(): Long = System.currentTimeMillis() -
          fsys.getFileStatus(token).getModificationTime
        while (fsys.exists(token) && age() <= expiry + 500L)
          Thread.sleep(200L)
        report(fold(batch2, "b2"))
        spark.stop()
      case "resume" =>
        // the dead application's writer token must refuse us first
        val refused =
          try { fold(batch2, "b2"); false }
          catch {
            case e: IllegalStateException
                if e.getMessage.contains("locked by writer") => true
          }
        println(s"REFUSED:$refused")
        graft.operators.Dedup.breakIncrementalDedupWriterLock(spark, prefix)
        report(fold(batch2, "b2"))
        spark.stop()
      case "replay" =>
        report(fold(batch2, "b2"))
        spark.stop()
      case other =>
        System.err.println(s"unknown step: $other")
        sys.exit(2)
    }
  }
}
