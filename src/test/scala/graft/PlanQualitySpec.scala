package graft

import org.apache.spark.sql.DataFrame

/** Plan-quality regression tests: the properties that make these queries
  * scale (pushdown reaching the scan, pruned read schemas, broadcast star
  * joins, no shuffle before partial aggregation) are asserted against the
  * physical plan so a refactor can't silently regress them.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q04 star join broadcasts both dimension sides") {
    val p = plan(QueriesCore.topkRevenue(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q04 prunes the lineitem scan to 2 columns") {
    val p = plan(QueriesCore.topkRevenue(spark, sfDir))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      p.take(2000))
  }

  test("q09 pushes the part-size filter into the parquet scan") {
    val p = plan(QueriesCore.joinAnti(spark, sfDir))
    assert(p.contains("LessThanOrEqual(p_size,10)"), p.take(2000))
  }

  test("q01 aggregates partially before the exchange") {
    val p = plan(QueriesCore.aggPricing(spark, sfDir))
    val partial = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(partial >= 0 && exchange >= 0)
    // plan prints top-down: final agg, exchange, partial agg, scan — the
    // text after the exchange must contain another HashAggregate (partial)
    assert(p.indexOf("HashAggregate", exchange) > exchange, p.take(2000))
  }

  test("dedup exact shuffles hashes, not document text") {
    val df = graft.operators.Dedup.exact(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")
    val p = plan(df)
    // the aggregation side reads only (doc_id, text->hash); the exchange
    // carries the 8-byte hash key, visible as xxhash64 in the plan
    assert(p.contains("xxhash64"), p.take(2000))
  }

  test("IVF-PQ index build is a shuffle-free projection over the scan") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val df = graft.operators.Similarity.ivfPqTopK(emb, queries, k = 3,
      nList = 4, nProbe = 2, m = 8, codebookSize = 8, trainSample = 200)
    val p = plan(df)
    // the corpus side must reach the probes join without an Exchange: codes
    // are computed in the scan's projection, and the join side broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("pq_encode"), p.take(3000))
  }

  test("q28 pushes both date filters into their parquet scans") {
    val p = plan(QueriesCore.shippingPriority(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate,")
      || p.contains("GreaterThan(l_shipdate,"), p.take(3000))
    assert(p.contains("LessThan(o_orderdate,"), p.take(3000))
  }

  test("q37 salted aggregation partial-aggregates on (key, salt) before the exchange") {
    val p = plan(QueriesCore.skewSaltedAgg(spark, sfDir))
    val exchange = p.indexOf("Exchange")
    assert(exchange >= 0, p.take(2000))
    // partial HashAggregate below the first exchange keyed by the salt
    val below = p.substring(exchange)
    assert(below.contains("HashAggregate"), p.take(3000))
    assert(p.contains("__salt") || p.contains("pmod"), p.take(3000))
  }

  test("minhash band-bucket shuffles carry ids, never shingle arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // AQE wraps the physical plan in AdaptiveSparkPlanExec, hiding the
    // exchanges from collect() until execution — use the static plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bandExchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id",
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("__band") => e
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(bandExchanges.nonEmpty, "expected band-keyed exchanges in plan")
    // the banding exchanges must ship only (band, bandhash, id [, count]) —
    // the shingle array column joins in AFTER pair dedup, by id
    bandExchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(!cols.exists(_.startsWith("__sh")),
        s"band exchange ships shingle arrays: $cols")
    }
  }

  test("minhash bucket guard is one capped aggregation, no window (x03 shape)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // x03's exact parameters. The bucket guard is collect_capped +
      // local pair explosion: the banded stream shuffles ONCE (into the
      // aggregation), so the signature kernel under it evaluates once,
      // and there is NO WindowExec — the old window-count guard buffered
      // a whole (band, hash) bucket per task before the size was known,
      // a straggler/spill on templated corpora. A refactor that
      // reintroduces a window or a band self-join breaks both properties.
      val df = graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id",
        shingleK = 3, numHashes = 64, bands = 16, threshold = 0.5)
      val p = df.queryExecution.executedPlan
      val bandShuffles = p.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("__band") => e
      }
      assert(bandShuffles.size == 1,
        s"expected exactly one band-keyed exchange, got ${bandShuffles.size}")
      val ps = p.toString
      assert(!ps.contains("Window"), ps.take(3000))
      assert(ps.contains("collect_capped"), ps.take(3000))
      // the verify probe restricts the shingle re-evaluation to CANDIDATE
      // docs via a semi-join below the shingle projection, and both verify
      // branches hang off the same pairIds exchange: a single band-keyed
      // exchange above plus a ReusedExchange here proves the banded kernel
      // ran once and the corpus was never shingled a second time
      assert(ps.contains("ReusedExchange"), ps.take(3000))
      assert(ps.contains("LeftSemi"), ps.take(3000))
      // ... and the candidate shingle frame itself sits under ONE shared
      // id-keyed exchange consumed by both join sides: exactly two live
      // shingle_hashes kernels in the whole plan (banded + candSets —
      // ReusedExchange dedups the per-side copy). Three means a branch
      // got its own specialized semi-join + kernel (and, at scale, its
      // own corpus scan) — the regression this pin exists to catch.
      assert("shingle_hashes".r.findAllIn(ps).length == 2,
        s"expected 2 shingle_hashes kernels (banded + shared candSets), " +
          s"got ${"shingle_hashes".r.findAllIn(ps).length}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("incremental dedup fold reads band history exactly once (x42 shape)") {
    // the r9 hot-bucket guard recounted the ENTIRE _bands state per fold —
    // a second full-history scan on top of the candidate join's own read.
    // The r10 guard sizes buckets against the incrementally-maintained
    // _bucket_counts table, so the fold's candidate plan must reference
    // _bands through EXACTLY ONE scan. A refactor that reintroduces the
    // recount (or an ok-bucket semi-join on the history side) breaks this.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.Dedup
    val spark2 = spark
    import spark2.implicits._
    val prefix = s"x42pin_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      val batch1 = Seq(
        (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
        .toDF("doc_id", "text")
      Dedup.incrementalMinhashDedup(batch1, prefix, "text", "doc_id",
        buckets = 2).unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val batch2 = Seq(
        (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3L, "phi chi psi omega aleph bet gimel dalet he vav"))
        .toDF("doc_id", "text")
      val (sigs, banded) = Dedup.bandBatch(batch2, "text", "doc_id",
        3, 64, 16, 42L)
      val losers = Dedup.incrementalLoserIds(spark, sigs, banded, prefix,
        threshold = 0.7, maxBucketSize = 1000)
      val scans = losers.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString).mkString(",")
      }
      val bandScans = scans.count(_.contains(s"${prefix}_bands"))
      val countScans = scans.count(_.contains(s"${prefix}_bucket_counts"))
      assert(bandScans == 1,
        s"expected exactly one _bands scan, got $bandScans in: $scans")
      assert(countScans == 1,
        s"expected exactly one _bucket_counts scan, got $countScans in: $scans")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      Dedup.dropIncrementalDedupState(spark, prefix)
    }
  }

  test("incremental dedup verify joins the bucketed _shingles history " +
      "exchange-free (no history-array re-shuffle on dup-heavy folds)") {
    // the old formulation unioned history and batch shingles BEFORE the
    // pair join; the union erased the table's id-bucketing, so the stored
    // shingle arrays re-shuffled on every fold large enough to exceed the
    // broadcast threshold — re-buying the exchange the layout pre-paid.
    // The split-join form must keep the _shingles scan out of every
    // shuffle exchange even with broadcasting disabled.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.Dedup
    val spark2 = spark
    import spark2.implicits._
    val prefix = s"shpin_${System.nanoTime()}"
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val batch1 = Seq(
        (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
        .toDF("doc_id", "text")
      Dedup.incrementalMinhashDedup(batch1, prefix, "text", "doc_id",
        buckets = 2).unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch2 = Seq(
        (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3L, "phi chi psi omega aleph bet gimel dalet he vav"))
        .toDF("doc_id", "text")
      val (sigs, banded) = Dedup.bandBatch(batch2, "text", "doc_id",
        3, 64, 16, 42L)
      val losers = Dedup.incrementalLoserIds(spark, sigs, banded, prefix,
        threshold = 0.7, maxBucketSize = 1000)
      val plan = losers.queryExecution.executedPlan
      // a violating exchange re-shuffles the _shingles scan's own output
      // (scan below it, no join in between); exchanges ABOVE the verify
      // join (e.g. the final distinct) legitimately contain the scan in
      // their subtree and are not re-shuffles of the stored arrays
      val shuffledShingleScans = plan.collect {
        case e: ShuffleExchangeExec
          if e.child.collect {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }.isEmpty &&
            e.child.collectLeaves().exists {
              case f: FileSourceScanExec => f.relation.location.rootPaths
                .exists(_.toString.contains(s"${prefix}_shingles"))
              case _ => false
            } => e
      }
      assert(shuffledShingleScans.isEmpty,
        "the bucketed _shingles history is re-shuffled by the verify join")
      // and the scan IS present (the pin must not pass vacuously)
      val shingleScans = plan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains(s"${prefix}_shingles")) => f
      }
      assert(shingleScans.nonEmpty, "no _shingles scan found in the plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Dedup.dropIncrementalDedupState(spark, prefix)
    }
  }

  test("containmentPairs takes set sizes from size(set), not an " +
      "explode+groupBy recount") {
    // sizes used to aggregate the exploded postings by doc id — a full
    // extra exchange for a number the (distinct) shingle array already
    // knows. The plan must carry no aggregate grouped solely by __cid:
    // the remaining aggregations are the per-gram capped-collect
    // (grouped by __g) and the per-pair shared count.
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Dedup.containmentPairs(docs, "text", "doc_id")
    val cidOnlyAggs = df.queryExecution.executedPlan.collect {
      case a: HashAggregateExec
        if a.groupingExpressions.map(_.name) == Seq("__cid") => a
      case a: ObjectHashAggregateExec
        if a.groupingExpressions.map(_.name) == Seq("__cid") => a
      case a: SortAggregateExec
        if a.groupingExpressions.map(_.name) == Seq("__cid") => a
    }
    assert(cidOnlyAggs.isEmpty,
      "the per-doc size recount aggregation is back in the plan")
  }

  test("ICWS band-bucket shuffles carry ids, never TF structs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bandExchanges = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.operators.Dedup.weightedMinhashCandidates(docs, "text",
        "doc_id", shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("__band") => e
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(bandExchanges.nonEmpty, "expected band-keyed exchanges in plan")
    // the (hashes, weights) struct joins in AFTER pair dedup, by id — the
    // wide banding shuffle must never carry it
    bandExchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(!cols.exists(_.startsWith("__tf")),
        s"band exchange ships TF structs: $cols")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import org.apache.spark.sql.functions._
    // one hot key carrying most rows; thresholds lowered so test-scale data
    // trips the same OptimizeSkewedJoin rewrite a 100 TB hot key would
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val spark2 = spark
      import spark2.implicits._
      val hot = spark.range(0, 60000)
        .select((when($"id" % 100 === 0, $"id" % 7).otherwise(lit(0L)))
          .as("k"), $"id".as("payload"),
          concat_ws("-", Seq.fill(8)($"id"): _*).as("pad"))
      val dim = spark.range(0, 7).select($"id".as("k"), ($"id" * 10).as("v"))
      val joined = hot.join(dim, Seq("k"))
      // collect() drives THIS dataset's own query execution — count() or a
      // write would build a separate one and leave this plan un-finalized
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("unhinted star join degrades to sort-merge when broadcast is off") {
    // q04 pins broadcast() explicitly (its dims are bounded); the UNHINTED
    // formulation must degrade gracefully to a shuffled join when a
    // dimension outgrows every broadcast threshold — same keys, no OOM path
    val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey")
      val plan = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(2000))
      assert(!plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally prevT match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom-filter join pruning engages when thresholds allow") {
    // Catalyst injects bloom_filter_agg/might_contain on the probe side of
    // a shuffle join with a selective build side (on by default; size
    // thresholds put it out of reach at test scale, so lower them here).
    // At 100 TB this is the free semi-join reduction for every q04-shaped
    // star join too big to broadcast.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val parts = spark.read.parquet(s"$sfDir/part.parquet")
        .filter(org.apache.spark.sql.functions.col("p_size") <= 5)
      val joined = li.join(parts,
        li("l_partkey") === parts("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        p.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("decontamination probes the benchmark n-gram set in one projection") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextPipeline.flagContaminated(docs,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 20),
      "text", "doc_id", n = 13)
    val p = plan(df)
    // in-set benchmark: the whole stage is scan -> project (set membership
    // via long_set_count) — no join, no explode, no exchange, and the
    // shingle kernel appears exactly once (CollapseProject must not
    // duplicate it into the `contaminated` derivation)
    assert(p.contains("long_set_count"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Generate"), p.take(3000))
    assert("shingle_hashes".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("decontamination falls back to a broadcast join past the set bound") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextPipeline.flagContaminated(docs,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 20),
      "text", "doc_id", n = 13, maxSetNgrams = 1)
    val p = plan(df)
    // oversize benchmark: the corpus side probes a broadcast — no
    // sort-merge join, no corpus-text exchange, n-grams as 8-byte hashes
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("shingle_hashes"), p.take(3000))
  }

  test("cross-corpus dedup probes the bloom scan-locally; only candidates join") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Dedup.crossExactDedup(
      docs.filter(col("doc_id") % 3 =!= 0),
      docs.filter(col("doc_id") % 3 === 0), "text", "doc_id")
    val p = plan(df)
    // the bloom probe rides the corpus scan (a Filter, not a join), and
    // the exact verify of bloom positives joins WITHOUT sort-merge — the
    // proven-unique bulk reaches the union through no exchange at all
    assert(p.contains("bloom_might_contain"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("Union"), p.take(3000))
  }

  test("chunking is exchange-free: tokenize + slices + explode only") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextPipeline.chunkByTokens(docs, "text",
      "doc_id", chunkSize = 32, overlap = 8)
    val p = plan(df)
    assert(!p.contains("Exchange"), p.take(3000))
  }

  test("mixture sampling's corpus pass is a broadcast probe, no shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
    val df = graft.operators.Sampling.mixtureSample(docs, "text", "doc_id",
      "source", weights, tokenBudget = 10000L)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("substring-dedup occurrence stream shuffles window hashes, not text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextPipeline.duplicatedSpanStats(docs, "text",
      "doc_id", k = 20)
    val p = plan(df)
    assert(p.contains("xxhash64"), p.take(3000))
    // occurrences shuffle by the 8-byte hash; document text must not
    // survive into any exchange
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(__g")
    assert(exchangeIdx >= 0, p.take(3000))
    // hot-window safety: canonical selection is a partially-aggregated
    // min(struct) + join, NEVER a sort-rank window — a Window over __g
    // funnels every occurrence of one hot hash into a single task
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("partial_min") || p.contains("partial min"),
      p.take(3000))
  }

  test("whole-stage codegen covers the scan-project-filter spine of q15") {
    // under AQE the pre-execution plan hides codegen stages; disable it for
    // this one assertion so the static physical plan shows the codegen spans
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = plan(QueriesCore.scalarFuncs(spark, sfDir))
      // "*(n)" prefixes mark whole-stage-codegen stages in the compact form
      assert(p.contains("*(1)"), p.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("winnow overlap is kernel + capped aggregation, no window (x64)") {
    val p = plan(QueriesExt.queries("x64_winnow_overlap")(spark, sfDir))
    // selection is ONE native kernel pass (never the HOF formulation the
    // optimizer inlines per-window), postings cap via collect_capped
    assert(p.contains("winnow_fingerprints"), p.take(3000))
    assert(p.contains("collect_capped"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000)) // pairs expand locally
  }

  test("cross near-dedup caps reference buckets; no window (x63)") {
    val df = graft.operators.Dedup.crossMinhashDedup(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(200),
      spark.read.parquet(s"$sfDir/documents.parquet").limit(50),
      "text", "doc_id")
    val p = plan(df)
    assert(p.contains("collect_capped"), p.take(3000))
    assert(p.contains("minhash_signature"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("funnel pushes every step's type filter into its scan; " +
      "no window, no per-user sort (x66)") {
    val df = QueriesExt.queries("x66_event_funnel")(spark, sfDir)
    val p = plan(df)
    for (step <- Seq("view", "click", "purchase"))
      assert(p.contains(s"EqualTo(event_type,$step)"), p.take(4000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("retention aggregates partially before both exchanges; " +
      "no window (x67)") {
    val p = plan(QueriesExt.queries("x67_retention")(spark, sfDir))
    assert(!p.contains("Window"), p.take(3000))
    // the per-user first-period and the (cohort, offset) distinct both
    // map-side combine: a partial HashAggregate below each exchange
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(exchange >= 0 && p.indexOf("HashAggregate", exchange) > exchange,
      p.take(3000))
  }

  test("tfidf keyword rank filter becomes a WindowGroupLimit (x68)") {
    val p = plan(QueriesExt.queries("x68_tfidf_keywords")(spark, sfDir))
    // rank <= k pushes a per-partition group limit BELOW the window sort,
    // so no task ever sorts more than k+carry rows per doc group twice
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("cross containment broadcasts capped reference buckets; the " +
      "corpus side never sort-merges (x76)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Dedup.crossContainment(
      docs.limit(300), docs.limit(50), "text", "doc_id")
    val p = plan(df)
    assert(p.contains("collect_capped"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("banned-phrase audit is one exchange-free kernel projection (x77)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextPipeline.flagBannedPhrases(
      docs, "text", Seq("merge slow", "batch stream"))
    val p = plan(df)
    assert(p.contains("multi_pattern_hits"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("anomaly scoring windows over period series, partial-aggregated " +
      "counts below the exchange (x79)") {
    val df = graft.operators.Anomaly.hourlyZScores(
      graft.Tables.events(spark, sfDir))
    val p = plan(df)
    val exchange = p.indexOf("Exchange hashpartitioning")
    assert(exchange >= 0 && p.indexOf("HashAggregate", exchange) > exchange,
      p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("transition matrix broadcasts the per-cur normalizer (x80)") {
    val df = graft.operators.Funnel.transitionMatrix(
      graft.Tables.events(spark, sfDir), "user_id", "ts", "event_id",
      "event_type")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("cosine postings evaluate the shingle-tf kernel once (x65)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val postings = docs
      .select(col("doc_id").as("__id"),
        graft.operators.Dedup.shingleTf(col("text"), 3).as("__tf"))
      .select(col("__id"), explode(arrays_zip(
        col("__tf.hashes"), col("__tf.weights"))).as("__e"))
    // the two struct-field extracts must NOT each inline a kernel copy
    // (the CollapseProject duplication class — see WinnowFingerprintsExpr)
    val p = postings.queryExecution.optimizedPlan.toString
    assert("shingle_tf".r.findAllIn(p).length == 1, p.take(3000))
  }

  test("ewma smoothing: two key-reusing exchanges, kernel scan runs " +
      "once per series, no window (x82)") {
    val df = graft.operators.Anomaly.ewmaSmooth(
      graft.Tables.events(spark, sfDir))
    val p = plan(df)
    assert(!p.contains("Window"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      p.take(3000))
    assert("ewma_scan".r.findAllIn(
      df.queryExecution.optimizedPlan.toString).length == 1)
  }

  test("association rules: one basket collect under the capped guard, " +
      "no union-duplicated pair subtree, broadcast measure joins (x85)") {
    val df = graft.operators.MarketBasket.rules(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "l_orderkey", "l_partkey")
    val p = plan(df)
    // the capped guard is the ONLY basket materialization (consumers
    // repeat the subtree in the printed plan; AQE reuses the identical
    // exchange stages at runtime)
    assert(p.contains("collect_capped"), p.take(3000))
    assert(!p.contains("Union"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("change feed is ONE join: the version snapshots meet in a single " +
      "full-outer shuffle join, images expand locally (x88 shape)") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-pq-cdc")
      .toString + "/t"
    try {
      import spark.implicits._
      val base = (0L until 100L).map(i => (i, i * 2)).toDF("id", "v")
      graft.sources.VersionedTable.init(base, root)
      graft.sources.VersionedTable.merge(spark, root,
        Seq((5L, 99L)).toDF("id", "v"), Seq("id"))
      val p = plan(graft.sources.VersionedTable.changeFeed(
        spark, root, 0, 1, Seq("id")))
      assert("Join FullOuter".r.findAllIn(p).length +
        "FullOuter".r.findAllIn(p).length >= 1, p.take(3000))
      val joins = "SortMergeJoin".r.findAllIn(p).length +
        "ShuffledHashJoin".r.findAllIn(p).length +
        "BroadcastHashJoin".r.findAllIn(p).length
      assert(joins == 1, p.take(3000))
      assert(!p.contains("Window"), p.take(3000))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("interval overlap join is a hash equi-join on the bucket — no " +
      "nested loop, no cartesian, no post-join distinct (x91 shape)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i * 10, i * 10 + 25))
      .toDF("lid", "ls", "le")
    val r = (0L until 50L).map(i => (i, i * 7, i * 7 + 40))
      .toDF("rid", "rs", "re")
    val p = plan(graft.operators.RangeJoin.intervalOverlap(
      l, r, "ls", "le", "rs", "re", bucketWidth = 16L))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("HashAggregate(keys=[lid"), p.take(3000))
    assert(p.contains("Join"), p.take(3000))
  }

  test("label outliers: rank cut runs as WindowGroupLimit, centroids " +
      "ride the task binary — no dim explode, no label-wide sort first " +
      "(x92 shape)") {
    val p = plan(QueriesExt.queries("x92_label_outliers")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(!p.contains("Generate"), p.take(3000)) // no posexplode of dims
  }

  test("source quota's rank cut runs as a WindowGroupLimit: the exchange " +
      "carries at most quota rows per source per input partition (x96)") {
    val p = plan(QueriesExt.queries("x96_source_quota")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("DSIR scores via a broadcast model join; the only sort-free " +
      "hash exchanges carry bucket ints and doc-id partial sums (x97)") {
    val p = plan(QueriesExt.queries("x97_dsir_select")(spark, sfDir))
    // the <=numBuckets-row log-ratio model broadcasts back to the token
    // stream — never a shuffle join against corpus-sized feature rows
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    // both aggregations (bucket histograms, per-doc weight sums) combine
    // map-side before their exchange
    val firstEx = p.indexOf("Exchange hashpartitioning")
    assert(firstEx >= 0 && p.indexOf("HashAggregate", firstEx) > firstEx,
      p.take(3000))
  }

  test("gopher repetition is kernel-local: no join, no window, no " +
      "aggregate — only the undersplit widen and the final sort " +
      "shuffle (x98)") {
    val p = plan(QueriesExt.queries("x98_gopher_repetition")(spark, sfDir))
    // the relational formulation would explode tokens and window over
    // (doc, ngram); the kernel keeps all five signals row-local
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("HashAggregate"), p.take(3000))
    assert(p.contains("ngram_stats"), p.take(3000))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => l.contains("REPARTITION_BY_NUM") ||
      l.contains("rangepartitioning")), exchanges.mkString("\n"))
  }

  test("leak-safe splits assign via a hash join on the dup-bounded " +
      "component map — no cartesian, no nested loop (x99)") {
    val p = plan(QueriesExt.queries("x99_leak_safe_splits")(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("Join"), p.take(3000))
  }

  test("guarded blocking (x74): the fused ledger is capped-collect " +
      "aggregations — no window, no cartesian, pair expansion local") {
    val p = plan(QueriesExt.queries("x74_fuzzy_match")(spark, sfDir))
    // the degenerate-block guard must NEVER buffer a whole block in a
    // window partition; the cascade is collect_capped + count per level
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("collect_capped"), p.take(3000))
    // over-cap rows advance through semi joins (empty at this SF but the
    // plan shape is fixed); name fetches are the only other joins
    assert(p.contains("LeftSemi"), p.take(3000))
  }

}
