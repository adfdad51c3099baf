package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.operators.Pq
import graft.functions.expr.CosineSimilarityExpr.cosineSim

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.8f, 0.2f, 0.0f)) // close to 0 and 1
  ).toDF("vec_id", "embedding")

  test("native cosine expression matches HOF formulation") {
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        cosineSim($"a.embedding", $"b.embedding").as("native"),
        VectorFunctions.cosine($"a.embedding", $"b.embedding").as("hof"))
      .collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("cosine endpoints: self=1, orthogonal=0, opposite=-1") {
    val m = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        cosineSim($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(m((0L, 0L)) - 1.0) < 1e-9)
    assert(math.abs(m((0L, 2L))) < 1e-9)
    assert(math.abs(m((0L, 3L)) + 1.0) < 1e-9)
  }

  test("brute-force top-k returns nearest neighbors in rank order") {
    val out = Similarity.bruteForceTopK(vecs,
      vecs.filter($"vec_id" === 0L), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.length == 2)
    assert(out.head._1 == 1L) // rank 1: closest
    assert(out(1)._1 == 4L) // rank 2
  }

  test("LSH top-k recalls planted near-duplicate neighbors") {
    // LSH recall is only meaningful when similar pairs exist: plant queries
    // that are slightly perturbed copies of corpus vectors (cosine ~ 1), and
    // require LSH to find the original as the nearest neighbor.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.lshTopK(emb, queries, k = 1,
      nPlanes = 8, dim = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"planted-neighbor recall $recall too low")
  }

  test("IVF top-k recalls planted near-duplicate neighbors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.ivfTopK(emb, queries, k = 1,
      nList = 8, nProbe = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"planted-neighbor IVF recall $recall too low")
  }

  test("IVF-PQ top-k recalls planted near-duplicate neighbors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.ivfPqTopK(emb, queries, k = 1,
      nList = 8, nProbe = 2, m = 8, codebookSize = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"planted-neighbor IVF-PQ recall $recall too low")
  }

  test("IVF-PQ ADC approximates the true dot within quantization error") {
    // encode+score every corpus vector against one query: the ADC estimate
    // must correlate with exact cosine (avg abs error bounded well below the
    // score spread), otherwise the shortlist phase is garbage-in
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    val q = emb.filter($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(emb, q, k = 199)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val pq = Similarity.ivfPqTopK(emb, q, k = 199,
      nList = 4, nProbe = 4, m = 8, codebookSize = 16, refine = 250)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    // refine >= candidate pool means every returned cosine is exact —
    // re-rank must agree with brute force wherever both returned the id
    val common = exact.keySet.intersect(pq.keySet)
    assert(common.nonEmpty)
    common.foreach { id =>
      assert(math.abs(exact(id) - pq(id)) < 1e-9,
        s"re-ranked cosine for $id diverges")
    }
  }

  test("two-level PQ cuts reconstruction error and keeps planted recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // driver-side: level-2 must strictly tighten the quantization
    val sample = emb.limit(500).select($"embedding").collect()
      .map(_.getSeq[Any](0).map { case f: Float => f.toDouble }.toArray)
      .map(Pq.normalize)
    val m2 = Pq.train2(sample, nList = 8, m = 8, codebookSize = 16)
    def nearest(p: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (j <- cents.indices) {
        var d = 0.0
        for (i <- p.indices) { val r = p(i) - cents(j)(i); d += r * r }
        if (d < bd) { bd = d; best = j }
      }
      best
    }
    val dim = sample(0).length
    val subDim = dim / 8
    var err1 = 0.0
    var err2 = 0.0
    sample.foreach { p =>
      val cent = m2.coarse(nearest(p, m2.coarse))
      for (s <- 0 until 8) {
        val off = s * subDim
        val r1 = Array.tabulate(subDim)(i => p(off + i) - cent(off + i))
        val e1 = m2.codebooks(s)(nearest(r1, m2.codebooks(s)))
        val r2 = Array.tabulate(subDim)(i => r1(i) - e1(i))
        val e2 = m2.codebooks2(s)(nearest(r2, m2.codebooks2(s)))
        for (i <- 0 until subDim) {
          err1 += r2(i) * r2(i)
          val rr = r2(i) - e2(i)
          err2 += rr * rr
        }
      }
    }
    assert(err2 < err1 * 0.8,
      s"level-2 should cut residual energy: $err2 vs $err1")

    // end-to-end: planted recall with levels=2
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.ivfPqTopK(emb, queries, k = 1,
      nList = 8, nProbe = 2, m = 8, codebookSize = 16, levels = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"two-level IVF-PQ recall $recall too low")
  }

  test("OPQ-rotated IVF-PQ keeps planted recall and exact re-rank") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.ivfPqTopK(emb, queries, k = 1,
      nList = 8, nProbe = 2, m = 8, codebookSize = 16, opqIters = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"OPQ IVF-PQ recall $recall too low")
    // re-rank must stay in the ORIGINAL space: returned cosines match
    // brute force exactly wherever both return the id
    val q1 = emb.filter($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(emb.limit(200), q1, k = 199)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val viaOpq = Similarity.ivfPqTopK(emb.limit(200), q1, k = 199,
      nList = 4, nProbe = 4, m = 8, codebookSize = 16, refine = 250,
      opqIters = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val common = exact.keySet.intersect(viaOpq.keySet)
    assert(common.nonEmpty)
    common.foreach { id =>
      assert(math.abs(exact(id) - viaOpq(id)) < 1e-9,
        s"re-ranked cosine for $id diverges under OPQ")
    }
  }

  test("IVF-HNSW top-k recalls planted near-duplicate neighbors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.ivfHnswTopK(emb, queries, k = 1,
      nList = 8, nProbe = 2, ef = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"IVF-HNSW planted recall $recall too low")
    // reported cosines are exact (scores computed on true vectors)
    val one = Similarity.ivfHnswTopK(emb.limit(100),
      emb.filter($"vec_id" === 0L), k = 3, nList = 2, nProbe = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    val brute = Similarity.bruteForceTopK(emb.limit(100),
      emb.filter($"vec_id" === 0L), k = 99)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toMap
    one.foreach { case (id, c) =>
      assert(math.abs(c - brute(id)) < 1e-9, s"cosine for $id diverges")
    }
  }

  test("persisted HNSW index round-trips through parquet and keeps recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-idx")
    Similarity.buildHnswIndex(emb, nList = 8)
      .write.parquet(s"$dir/index")
    val index = spark.read.parquet(s"$dir/index")
    val queries = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val approx = Similarity.searchHnswIndex(index, queries, k = 1,
      nProbe = 2, ef = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val recall = (0L until 20L).count { q =>
      approx.get(q + 100000L).contains(q)
    } / 20.0
    assert(recall >= 0.9, s"persisted-index recall $recall too low")
    // the scan of unprobed cells is pruned at the parquet source
    val one = Similarity.searchHnswIndex(index,
      emb.filter($"vec_id" === 0L), k = 3, nProbe = 1)
    assert(one.count() == 3)
  }

  test("appended HNSW index finds appended vectors like built-in ones") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(pmod($"vec_id", lit(2)) === 0)
    val adds = emb.filter(pmod($"vec_id", lit(2)) === 1)
    val index = Similarity.appendToHnswIndex(
      Similarity.buildHnswIndex(base, nList = 8), adds)
    // every corpus id is in the index exactly once, centroids intact
    val n = emb.count()
    assert(index.filter(!$"is_centroid").count() == n)
    assert(index.filter(!$"is_centroid").select("id").distinct().count() == n)
    assert(index.filter($"is_centroid").count() == 8)
    // planted perturbed copies of ODD (appended) ids must come back: an
    // append that wired its inserts into dead graphs would miss them
    val queries = emb.filter($"vec_id" < 40 && pmod($"vec_id", lit(2)) === 1)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          x => x.cast("double") * 1.01 + 0.001).as("embedding"))
    val got = Similarity.searchHnswIndex(index, queries, k = 1,
      nProbe = 2, ef = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val hits = (1L until 40L by 2).count { q =>
      got.get(q + 100000L).contains(q)
    }
    assert(hits >= 18, s"appended-vector recall $hits/20 too low")
  }

  test("hard negatives exclude near-duplicates above the threshold") {
    // vec 1 is a near-dup of vec 0 (cos ~0.994): it must NOT appear among
    // 0's hard negatives, while the merely-similar vec 4 must lead them
    val negs = Similarity.hardNegatives(vecs,
      vecs.filter($"vec_id" === 0L), k = 3, dupThreshold = 0.99)
      .orderBy("rank")
      .select("vec_id").as[Long].collect().toSeq
    assert(!negs.contains(1L), "near-duplicate leaked into negatives")
    assert(negs.head == 4L, s"hardest negative should be 4, got $negs")
    // with no threshold cap the near-dup would rank first
    val all = Similarity.hardNegatives(vecs,
      vecs.filter($"vec_id" === 0L), k = 3, dupThreshold = 1.1)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(all.head == 1L)
  }

  test("zero-norm vectors yield cosine 0, not NaN") {
    val z = Seq((100L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = z.crossJoin(vecs.limit(1).select($"embedding".as("other")))
      .select(cosineSim($"embedding", $"other").as("c"))
      .head().getDouble(0)
    assert(c == 0.0)
  }

  test("l2Normalize produces unit vectors") {
    val norms = vecs.select(
      VectorFunctions.norm(VectorFunctions.l2Normalize($"embedding")).as("n"))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("nearDupPairs drops degenerate hot buckets under maxBucketSize") {
    // all-identical corpus: every vector lands in ONE bucket — the shape
    // that would go O(n^2) unguarded (clustered LLM embedding shards)
    val n = 300
    val degen = spark.range(n.toLong).select($"id".as("vec_id"),
      typedLit(Array.fill(8)(1.0f)).as("embedding"))
    // cap below the bucket size: the mega-bucket is dropped, the query
    // completes with zero pairs (bounded work; recall sacrificed by design)
    val capped = Similarity.nearDupPairs(degen, threshold = 0.9,
      nPlanes = 4, dim = 8, maxBucketSize = 100)
    assert(capped.count() == 0L)
    // cap at the bucket size: all C(n,2) identical pairs emerge
    val full = Similarity.nearDupPairs(degen, threshold = 0.9,
      nPlanes = 4, dim = 8, maxBucketSize = n)
    assert(full.count() == n.toLong * (n - 1) / 2)
  }

  test("nearDupPairs planted recall is unaffected by the default cap") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val planted = emb.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x.cast("float") * lit(1.001f))
        .as("embedding"))
    val corpus = emb.unionByName(planted)
    def pairSet(cap: Int): Set[(Long, Long)] =
      Similarity.nearDupPairs(corpus, threshold = 0.95, nPlanes = 8,
        dim = 64, maxBucketSize = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val withDefaultCap = pairSet(1000)
    val uncapped = pairSet(Int.MaxValue)
    assert(withDefaultCap == uncapped,
      "default cap changed results on a healthy (non-degenerate) corpus")
    // pure scaling keeps every sign pattern, so each planted copy shares
    // its source's bucket: the planted pair recall must be exact
    val nSrc = emb.count()
    val found = withDefaultCap.count { case (a, b) => b == a + 100000L }
    assert(found >= (nSrc * 0.99).toLong,
      s"planted recall $found/$nSrc too low")
  }

  test("semanticDedup: LSH path matches exact path and keeps min-id reps") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant two near-copies per source vector: pure scaling keeps cosine 1
    // with the source AND preserves every hyperplane sign pattern, so each
    // copy shares its source's bucket in every LSH table — the LSH duplicate
    // graph provably equals the exact graph on this corpus
    val c1 = emb.select(($"vec_id" + 100000L).as("vec_id"),
      transform($"embedding", x => x.cast("float") * lit(1.001f))
        .as("embedding"))
    val c2 = emb.select(($"vec_id" + 200000L).as("vec_id"),
      transform($"embedding", x => x.cast("float") * lit(0.999f))
        .as("embedding"))
    val corpus = emb.unionByName(c1).unionByName(c2)
    val lsh = Similarity.semanticDedup(corpus, threshold = 0.95,
      nPlanes = 8, nTables = 4)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.semanticDedup(corpus, threshold = 0.95,
      exact = true)
      .select("vec_id").as[Long].collect().toSet
    assert(lsh == exact, "LSH-path survivors diverge from exact-path")
    // every semantic group is {src, src+100k, src+200k} (base corpus has no
    // pairs at 0.95); keep-min means exactly the sources survive
    val n = emb.count()
    assert(exact.size.toLong == n)
    assert(exact.forall(_ < 100000L), "a planted copy displaced its source")
  }

  test("recommendedPlanes sizes buckets to ~targetBucket rows, clamped") {
    // floor: tiny corpora keep the default geometry
    assert(Similarity.recommendedPlanes(0L) == 8)
    assert(Similarity.recommendedPlanes(600L) == 8)
    // the sf3 collapse case: 180k rows must leave the 8-plane floor
    val p = Similarity.recommendedPlanes(180000L)
    assert(p >= 13, s"180k rows sized to only $p planes")
    // the sizing law: expected occupancy <= targetBucket
    assert(180000.0 / (1L << p) <= 32.0)
    // cap: a trillion rows cannot demand unbounded geometry
    assert(Similarity.recommendedPlanes(1000000000000L) == 16)
  }

  test("exactCosinePairs: over-budget corpus drops the hint, same edges") {
    // the size guard (maxBroadcastBytes) must change the PLAN, never the
    // answer: force the no-hint fallback with a zero budget and require
    // edge-for-edge equality with the broadcast path, and require the
    // forced-broadcast operator to be gone from the fallback plan
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").limit(300)
    def edges(budget: Long): Set[(Long, Long)] =
      Similarity.exactCosinePairs(emb, 0.5, maxBroadcastBytes = budget)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(edges(0L) == edges(Long.MaxValue),
      "broadcast guard changed the pair set")
    // autoBroadcastJoinThreshold off => the fallback must genuinely plan
    // without ANY broadcast (the guard exists for corpora past driver
    // memory, where a planner-chosen broadcast is equally fatal)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plan = Similarity.exactCosinePairs(emb, 0.5, maxBroadcastBytes = 0L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"zero-budget fallback still broadcasts:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("ANN training sample spans a cluster-sorted corpus layout") {
    // Two well-separated clusters written in vec_id order across many
    // files: head-of-corpus sampling (the old limit().collect()) would see
    // ONLY cluster A and train degenerate centroids. trainVectors orders by
    // id-hash, so both clusters must appear in proportion.
    val n = 1000
    val rows = (0 until n).map { i =>
      val rng = new scala.util.Random(i)
      val base =
        if (i < n / 2) Array(10.0f, 0.0f, 0.0f, 0.0f)
        else Array(0.0f, 10.0f, 0.0f, 0.0f)
      (i.toLong, base.map(_ + rng.nextFloat() * 2.0f))
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft-trainvec").toString
    rows.toDF("vec_id", "embedding")
      .repartitionByRange(8, $"vec_id")
      .write.mode("overwrite").parquet(path)
    val corpus = spark.read.parquet(path)
    val sample = Similarity.trainVectors(corpus, "vec_id", "embedding", 100)
    assert(sample.length == 100)
    val a = sample.count(v => v(0) > v(1))
    val b = sample.count(v => v(1) > v(0))
    assert(a >= 25 && b >= 25,
      s"training sample is layout-biased: clusterA=$a clusterB=$b")
    // end-to-end: PQ quantizer trained on that sample keeps recall on
    // LATE-file queries (perturbed cluster-B vectors) — the regime where a
    // first-partition-only sample would have produced garbage codebooks
    val queries = corpus.filter($"vec_id" >= (n - 10).toLong)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x.cast("float") * lit(1.01f))
          .as("embedding"))
    // refine must exceed what ADC noise can bury inside a TIGHT cluster
    // cell (~250 near-parallel vectors): the re-rank is exact, so recall
    // only needs the copy inside the shortlist
    val res = Similarity.ivfPqTopK(corpus, queries, k = 1,
      nList = 4, nProbe = 1, m = 4, codebookSize = 16, refine = 100,
      trainSample = 100)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    val hits = res.count { case (q, v) => v == q - 100000L }
    assert(hits >= 9, s"cluster-B planted recall $hits/10 too low")
  }

  test("labelOutliers ranks the planted off-cluster vector first and is " +
      "invariant to partitioning (algebraic VecSum merge)") {
    val dim = 8
    def vec(base: Float, noise: Float*) = {
      val a = Array.fill(dim)(base)
      noise.zipWithIndex.foreach { case (x, i) => a(i) += x }
      a
    }
    // label 0 clusters near (1,1,...); id 99 points the opposite way;
    // label 1 is a tight cluster with one mild wobble (id 203)
    val rows = Seq(
      (0L, 0L, vec(1f, 0.01f)), (1L, 0L, vec(1f, -0.02f, 0.01f)),
      (2L, 0L, vec(1f, 0.03f)), (99L, 0L, Array.fill(dim)(-1f)),
      (200L, 1L, vec(2f)), (201L, 1L, vec(2f, 0.01f)),
      (202L, 1L, vec(2f, -0.01f)), (203L, 1L, vec(2f, 0.8f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.labelOutliers(df, k = 2, dim = dim)
      .orderBy("label", "rank")
      .select("label", "vec_id", "rank")
      .as[(Long, Long, Long)].collect().toList
    assert(got.filter(_._1 == 0L).map(_._2).head === 99L)
    assert(got.filter(_._1 == 1L).map(_._2).head === 203L)
    assert(got.map(_._3) === List(1L, 2L, 1L, 2L))
    val repart = Similarity.labelOutliers(df.repartition(7), k = 2,
        dim = dim)
      .orderBy("label", "rank")
      .select("label", "vec_id", "rank")
      .as[(Long, Long, Long)].collect().toList
    assert(repart === got)
  }
}
