package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.expr.CosineSimilarityExpr.cosineSim

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`array<float>`) — LLM-pipeline extension tier (SURVEY.md §7.4).
  *
  * Scale design:
  *  - Brute force is the correctness baseline: `corpus x broadcast(queries)`
  *    — the corpus never shuffles, queries are broadcast, scoring is a
  *    projection (native [[CosineSimilarityExpr]] tight loop), and top-k is a
  *    per-query window over a pre-filtered candidate set. Cost is O(N*Q):
  *    right answer when Q is small, regardless of N.
  *  - LSH buckets (random hyperplanes) is the scale path: corpus and queries
  *    hash to sign-pattern buckets; only same-bucket (or multiprobe-adjacent)
  *    pairs are scored. Bucketing is one shuffle on an 8-byte key; recall is
  *    tuned by `nPlanes` (selectivity) x `nProbes` (bit-flip multiprobe).
  */
object Similarity {

  /** Bounded, deterministic, PARTITION-SPANNING training sample for the ANN
    * trainers. `limit(n).collect()` is the wrong tool here: limit satisfies
    * itself from the first partition(s), and ingest-partitioned parquet is
    * typically sorted/clustered — k-means would see a single shard and the
    * centroids degenerate (recall collapses at scale while staying green at
    * bench scale, where one file IS the corpus). Ordering by a hash of the id
    * plans as TakeOrderedAndProject (per-partition top-n + driver merge, no
    * full sort shuffle), touches every partition, and is deterministic for a
    * given corpus — the same property seeded `sample()` only gives per
    * partitioning layout.
    */
  private[operators] def trainVectors(corpus: DataFrame, idCol: String,
      vecCol: String, n: Int): Array[Array[Double]] =
    corpus.select(col(idCol), col(vecCol))
      // null vectors are acknowledged input elsewhere in this file
      // (labelOutliers filters them) — the shared training sampler must
      // not NPE on one; non-numeric element types fail loudly below
      // instead of a bare MatchError out of every ANN entry point
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(n)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          "trainVectors: embedding elements must be float/double, got " +
            (if (other == null) "null element" else other.getClass.getName))
      }.toArray)

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (queryIdCol, neighbor id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id"): DataFrame = {
    val q = broadcast(queryProbes(queries, idCol, vecCol, queryIdOut))
    val scored = corpus
      .select(col(idCol), col(vecCol))
      .crossJoin(q)
      .filter(col(idCol) =!= col(queryIdOut))
      .withColumn("cosine", cosineSim(col(vecCol), col("__qvec")))
    exactTopK(scored, k, idCol, queryIdOut)
  }

  /** Shared query-probe projection of the ANN entry points: the query
    * frame as `(queryIdOut, __qvec)` — the renamed id plus the vector the
    * exact verify tail scores against. One definition, not seven
    * byte-equivalent copies: per-site drift in exactly this block is the
    * class of bug behind the r15 IVF-HNSW wrong-cell probing fix.
    */
  private def queryProbes(queries: DataFrame, idCol: String,
      vecCol: String, queryIdOut: String): DataFrame =
    queries.select(col(idCol).as(queryIdOut), col(vecCol).as("__qvec"))

  /** Shared exact top-k tail of every ANN entry point: rank scored
    * candidates per query by (cosine DESC, id ASC — deterministic
    * tiebreak), keep `rank <= k`, and project the canonical
    * `(query_id, id, cosine, rank)` output schema. The window rides the
    * candidate frame's existing per-query grouping; candidates are
    * probe-bounded, so the rank never sorts more than one query's
    * candidate set per partition group.
    */
  private def exactTopK(scored: DataFrame, k: Int, idCol: String,
      queryIdOut: String): DataFrame = {
    val w = Window.partitionBy(queryIdOut)
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdOut), col(idCol), col("cosine"), col("rank"))
  }

  /** Hard-negative mining for contrastive training data (DPR / SimCSE
    * style): for each anchor, the `k` MOST similar candidates whose cosine
    * stays BELOW `dupThreshold` — similar enough to be informative
    * negatives, but excluded as probable positives/near-duplicates above
    * the threshold. Same scale shape as [[bruteForceTopK]] (corpus never
    * shuffles, anchors broadcast, scoring is a native-expression
    * projection); at 10^9-vector scale mine from an ANN candidate pool
    * ([[ivfTopK]]/[[lshTopK]] with a larger k) and apply the same
    * threshold/rank step.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
      dupThreshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryIdOut: String = "query_id"): DataFrame = {
    val q = broadcast(queryProbes(anchors, idCol, vecCol, queryIdOut))
    val scored = corpus
      .select(col(idCol), col(vecCol))
      .crossJoin(q)
      .filter(col(idCol) =!= col(queryIdOut))
      .withColumn("cosine", cosineSim(col(vecCol), col("__qvec")))
      .filter(col("cosine") < dupThreshold)
    exactTopK(scored, k, idCol, queryIdOut)
  }

  /** Approximate top-k via random-hyperplane LSH with multiprobe.
    *
    * Corpus rows are bucketed once; each query probes its own bucket plus
    * every bucket within hamming distance `probeRadius` in sign-pattern
    * space (radius 1 = single-bit flips, the classic multiprobe), then
    * exact cosine re-ranks the candidates. Candidate volume
    * ~ N * nProbes / 2^nPlanes per query, nProbes = Σ_{r<=radius} C(nPlanes,r).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id", probeRadius: Int = 1): DataFrame = {
    val planes = VectorFunctions.randomPlanes(nPlanes, dim, seed)
    val bucket = VectorFunctions.hyperplaneBucket(col(vecCol), planes)

    val bucketedCorpus = corpus
      .select(col(idCol), col(vecCol), bucket.as("__bucket"))

    // query probes: every sign-pattern mask within the hamming radius,
    // generated directly as bit combinations — Σ_{r<=radius} C(nPlanes, r)
    // masks at O(masks) cost. Enumerating-and-filtering 0 until 2^nPlanes
    // would be exponential in nPlanes and silently EMPTY at nPlanes >= 31
    // (1 << 31 overflows to Int.MinValue).
    require(nPlanes >= 1 && nPlanes <= 62, "nPlanes must be in [1, 62]")
    def masks(radius: Int): Seq[Long] = {
      def choose(from: Int, left: Int): Seq[Long] =
        if (left == 0) Seq(0L)
        else (from until nPlanes).flatMap(b =>
          choose(b + 1, left - 1).map(m => m | (1L << b)))
      (0 to math.min(radius, nPlanes)).flatMap(choose(0, _))
    }
    val probes = array(masks(probeRadius).map(lit): _*)
    val bucketedQueries = queries
      .select(col(idCol).as(queryIdOut), col(vecCol).as("__qvec"),
        bucket.as("__qbucket"))
      .withColumn("__bucket",
        explode(transform(probes, m => col("__qbucket").bitwiseXOR(m))))
      .drop("__qbucket")

    val candidates = bucketedCorpus
      .join(broadcast(bucketedQueries), Seq("__bucket"))
      .filter(col(idCol) =!= col(queryIdOut))
      .dropDuplicates(queryIdOut, idCol)
      .withColumn("cosine", cosineSim(col(vecCol), col("__qvec")))
    exactTopK(candidates, k, idCol, queryIdOut)
  }

  /** Approximate top-k via IVF (inverted-file) coarse quantization: k-means
    * centroids partition the corpus into `nList` cells; each query scores
    * only the cells of its `nProbe` nearest centroids, then exact cosine
    * re-ranks. The standard ANN scale path when the corpus has cluster
    * structure (IVF-Flat); centroids train on a bounded sample so training
    * cost is independent of corpus size, and cell assignment is one narrow
    * pass.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nList: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id", trainSample: Int = 10000): DataFrame = {
    // coarse quantization only needs rough centroids: few seeded Lloyd
    // iterations over a bounded driver-collected sample ([[Pq.lloyd]]) —
    // training cost independent of corpus size, ONE collect job instead of
    // an ML-pipeline's dozens of small jobs per fit
    // normalize BEFORE Lloyd, like every sibling (ivfPq/ivfHnsw/HNSW
    // build): cells are assigned by COSINE, so training on raw
    // magnitudes would let high-norm vectors dominate the centroids and
    // scatter each cosine-neighborhood across cells
    val sample = trainVectors(corpus, idCol, vecCol, trainSample)
      .map(Pq.normalize)
    val centroids = Pq.lloyd(sample, nList, iters = 5, seed = seed)

    // per-row cosine-vs-every-centroid scores in ONE native pass
    // (CentroidCosinesExpr: vector norm computed once, centroids baked in as
    // expression state) — corpus cell assignment is a shuffle-free
    // projection; argmax by array_position picks the first/lowest cell on
    // ties, same order the old windowed form used
    def scores(v: org.apache.spark.sql.Column) =
      graft.functions.expr.PqExprs.centroidCosines(v, centroids)

    val cells = corpus.select(col(idCol), col(vecCol))
      .withColumn("__scores", scores(col(vecCol)))
      .withColumn("__cell",
        (array_position(col("__scores"), array_max(col("__scores"))) - 1)
          .cast("int"))
      .drop("__scores")

    // queries: nProbe nearest cells each — tiny side, a window keyed by the
    // query id itself (no synthetic row ids)
    val qw = Window.partitionBy(queryIdOut)
      .orderBy(col("__score").desc, col("__cell").asc)
    val probes = queries
      .select(col(idCol).as(queryIdOut), col(vecCol).as("__qvec"))
      .select(col(queryIdOut), col("__qvec"),
        posexplode(scores(col("__qvec"))).as(Seq("__cell", "__score")))
      .withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= nProbe)
      .select(col(queryIdOut), col("__qvec"), col("__cell"))

    val candidates = cells
      .join(broadcast(probes), Seq("__cell"))
      .filter(col(idCol) =!= col(queryIdOut))
      .dropDuplicates(queryIdOut, idCol)
      .withColumn("cosine", cosineSim(col(vecCol), col("__qvec")))
    exactTopK(candidates, k, idCol, queryIdOut)
  }

  /** Approximate top-k via IVF-PQ: coarse cells + product-quantized residual
    * codes with exact re-ranking (Jegou et al. 2011).
    *
    * The 100 TB shape: the candidate scan touches only `(id, cell, m codes)`
    * — ~4m bytes a row instead of 4*dim-byte vectors (8x less at dim=64/m=8,
    * and the full-vector column stays column-pruned OUT of the scan) — and
    * full vectors are fetched by id-join only for the `refine` ADC survivors
    * per query. Training is driver-side on a bounded sample
    * ([[Pq.train]]), independent of corpus size; model arrays ride into
    * native expressions as literals. All scoring is dot-product on
    * L2-normalized vectors (== cosine), so the ADC decomposition
    * `dot(q,x) ~ dot(q, coarse(cell)) + sum_s dot(q_s, cb_s(code_s))` holds.
    *
    * `levels = 2` adds residual re-quantization ([[Pq.train2]]): a second
    * code array per row encoding what level 1 missed, and a second additive
    * ADC term — tighter shortlists (better recall at the same `refine`) for
    * double the code bytes, still far below full vectors.
    *
    * `opqIters > 0` learns an OPQ rotation ([[Opq.train]]) on the sample
    * and applies it (native `MatVecExpr`) before cell assignment and
    * encoding; orthogonality preserves cosine, so probing/ADC run in the
    * rotated space while exact re-rank stays in the original space.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nList: Int = 16, nProbe: Int = 4, m: Int = 8, codebookSize: Int = 32,
      refine: Int = 50, trainSample: Int = 2000, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id", levels: Int = 1,
      opqIters: Int = 0): DataFrame = {
    import graft.functions.expr.PqExprs
    require(levels == 1 || levels == 2, "levels must be 1 or 2")

    // --- driver-side training on a bounded normalized sample
    val rawSample: Array[Array[Double]] =
      trainVectors(corpus, idCol, vecCol, trainSample).map(Pq.normalize)
    // OPQ: learn the rotation on the normalized sample, then train the
    // coarse/PQ model in the rotated space
    val rotation: Option[Array[Array[Double]]] =
      if (opqIters > 0)
        Some(Opq.train(rawSample, m, codebookSize, opqIters,
          seed = seed).rotation)
      else None
    val sample = rotation match {
      case Some(r) => rawSample.map { x =>
        val out = new Array[Double](x.length)
        var i = 0
        while (i < x.length) {
          val xi = x(i)
          if (xi != 0.0) {
            var j = 0
            while (j < x.length) { out(j) += xi * r(i)(j); j += 1 }
          }
          i += 1
        }
        out
      }
      case None => rawSample
    }
    val model2: Option[Pq.IvfPq2Model] =
      if (levels == 2) Some(Pq.train2(sample, nList, m, codebookSize,
        seed = seed))
      else None
    val model = model2.map(_.base)
      .getOrElse(Pq.train(sample, nList, m, codebookSize, seed = seed))

    // all-native per-row kernels: single-pass normalize, one-pass
    // cosine-vs-every-centroid (norm computed once, no per-centroid lambdas)
    def normVec(c: org.apache.spark.sql.Column) = PqExprs.l2normalize(c)
    def rotVec(c: org.apache.spark.sql.Column) = rotation match {
      case Some(r) => PqExprs.matVec(c, r)
      case None => c
    }
    def scores(v: org.apache.spark.sql.Column) =
      PqExprs.centroidCosines(v, model.coarse)
    def cellOf(v: org.apache.spark.sql.Column) = {
      val s = scores(v)
      (array_position(s, array_max(s)) - 1).cast("int")
    }

    // --- index build: one shuffle-free projection per corpus row
    val indexed = corpus
      .select(col(idCol), rotVec(normVec(col(vecCol))).as("__nvec"))
      .withColumn("__cell", cellOf(col("__nvec")))
      .withColumn("__codes",
        PqExprs.pqEncode(col("__nvec"), col("__cell"),
          model.coarse, model.codebooks))
    val index = model2 match {
      case Some(m2) => indexed
        .withColumn("__codes2",
          PqExprs.pqEncode2(col("__nvec"), col("__cell"), col("__codes"),
            m2.coarse, m2.codebooks, m2.codebooks2))
        .select(col(idCol), col("__cell"), col("__codes"), col("__codes2"))
      case None =>
        indexed.select(col(idCol), col("__cell"), col("__codes"))
    }

    // --- query probes: nProbe nearest cells each (tiny side)
    val qw = Window.partitionBy(queryIdOut)
      .orderBy(col("__score").desc, col("__cell").asc)
    val probes = queries
      .select(col(idCol).as(queryIdOut), normVec(col(vecCol)).as("__qvec"))
      // probing/ADC run in the (possibly rotated) model space; exact
      // re-rank keeps the original-space __qvec
      .withColumn("__qrot", rotVec(col("__qvec")))
      .select(col(queryIdOut), col("__qvec"), col("__qrot"),
        posexplode(scores(col("__qrot"))).as(Seq("__cell", "__score")))
      .withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= nProbe)
      .select(col(queryIdOut), col("__qvec"), col("__qrot"), col("__cell"))

    // --- ADC scan over codes only; top-`refine` per query
    val aw = Window.partitionBy(queryIdOut)
      .orderBy(col("__adc").desc, col(idCol).asc)
    val adc1 = PqExprs.adcScore(col("__qrot"), col("__cell"), col("__codes"),
      model.coarse, model.codebooks)
    val adcFull = model2 match {
      case Some(m2) =>
        adc1 + PqExprs.pqCodesDot(col("__qrot"), col("__codes2"), m2.codebooks2)
      case None => adc1
    }
    val shortlist = index
      .join(broadcast(probes), Seq("__cell"))
      .filter(col(idCol) =!= col(queryIdOut))
      .withColumn("__adc", adcFull)
      .withColumn("__rk", row_number().over(aw))
      .filter(col("__rk") <= refine)
      .select(col(queryIdOut), col(idCol), col("__qvec"))

    // --- exact re-rank: fetch full vectors for survivors only
    val rescored = shortlist
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .withColumn("cosine", cosineSim(col(vecCol), col("__qvec")))
    exactTopK(rescored, k, idCol, queryIdOut)
  }

  /** Approximate top-k via IVF + per-cell HNSW graphs: corpus rows are
    * coarse-assigned to cells (as in [[ivfTopK]]), repartitioned BY CELL,
    * and each partition builds small in-memory [[Hnsw]] graphs — one per
    * cell it holds — then answers the broadcast queries probing those
    * cells. Graph memory scales with partition size, never corpus size;
    * this is the mapPartitions tier (d), justified because graph
    * construction/search is genuinely imperative per-partition logic.
    * Exact cosine re-rank of the merged per-cell candidates finishes the
    * query in the original space.
    *
    * Queries collect to the driver (the query side is small by contract —
    * same assumption as every broadcast-probe path here).
    */
  def ivfHnswTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nList: Int = 16, nProbe: Int = 4, hnswM: Int = 16,
      efConstruction: Int = 100, ef: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id", trainSample: Int = 2000): DataFrame = {
    import graft.functions.expr.PqExprs
    val spark = corpus.sparkSession
    import spark.implicits._

    val sample = trainVectors(corpus, idCol, vecCol, trainSample)
      .map(Pq.normalize)
    val centroids = Pq.lloyd(sample, nList, iters = 5, seed = seed)

    def scores(v: org.apache.spark.sql.Column) =
      PqExprs.centroidCosines(PqExprs.l2normalize(v), centroids)
    def cellOf(v: org.apache.spark.sql.Column) = {
      val s = scores(v)
      (array_position(s, array_max(s)) - 1).cast("int")
    }

    // query -> probed cells, computed driver-side and broadcast
    val qRows: Array[(Long, Array[Double], Array[Int])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map { r =>
        val qv = Pq.normalize(r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
        val cs = centroids.indices
          // rank probe cells by COSINE (dot over the centroid norm):
          // corpus rows were assigned by centroidCosines, and Lloyd
          // means are never unit-norm — a raw-dot ranking probes a
          // DIFFERENT cell set than the one the corpus partitioned by
          .map { i =>
            val d = centroids(i).zip(qv).map(t => t._1 * t._2).sum
            val cn = math.sqrt(centroids(i).map(x => x * x).sum)
            i -> (if (cn > 0.0) d / cn else 0.0)
          }
          .sortBy { case (i, s) => (-s, i) }
          .take(nProbe).map(_._1).toArray
        (r.getLong(0), qv, cs)
      }
    val byCell: Map[Int, Array[(Long, Array[Double])]] = qRows
      .flatMap { case (qid, qv, cells) => cells.map(c => c -> (qid, qv)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val bq = spark.sparkContext.broadcast(byCell)
    val dim = sample(0).length

    val candidates = corpus
      .select(col(idCol).cast("long").as("__id"),
        PqExprs.l2normalize(col(vecCol)).as("__nvec"),
        cellOf(col(vecCol)).as("__cell"))
      .repartition(col("__cell"))
      // deterministic insert order, like buildHnswIndex: HNSW adjacency
      // depends on insertion order, and shuffle-arrival order varies
      // across reruns — without this the returned candidate set flakes
      .sortWithinPartitions("__cell", "__id")
      .as[(Long, Array[Double], Int)]
      .mapPartitions { it =>
        val probed = bq.value
        // one graph per cell present in this partition
        val graphs = mutable.HashMap.empty[Int, Hnsw]
        it.foreach { case (id, vec, cell) =>
          if (probed.contains(cell)) {
            graphs.getOrElseUpdate(cell,
              new Hnsw(dim, hnswM, efConstruction, seed ^ cell))
              .insert(id, vec)
          }
        }
        graphs.iterator.flatMap { case (cell, g) =>
          probed(cell).iterator.flatMap { case (qid, qv) =>
            g.search(qv, k + 1, ef)
              .filter(_._1 != qid)
              .map { case (id, cos) => (qid, id, cos) }
          }
        }
      }
      .toDF(queryIdOut, idCol, "cosine")

    exactTopK(candidates, k, idCol, queryIdOut)
  }

  /** Materialize an IVF + per-cell-HNSW index as a DataFrame (write it to
    * parquet; the structure round-trips): graph nodes carry their
    * adjacency BY ID per layer, and the coarse centroids ride along as
    * `is_centroid` rows, so [[searchHnswIndex]] needs nothing but the
    * index itself. Build once, answer many query batches — the index-reuse
    * contract every ANN service needs.
    */
  def buildHnswIndex(corpus: DataFrame, nList: Int = 16, hnswM: Int = 16,
      efConstruction: Int = 100, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trainSample: Int = 2000): DataFrame = {
    import graft.functions.expr.PqExprs
    val spark = corpus.sparkSession
    import spark.implicits._

    val sample = trainVectors(corpus, idCol, vecCol, trainSample)
      .map(Pq.normalize)
    val centroids = Pq.lloyd(sample, nList, iters = 5, seed = seed)
    val dim = sample(0).length

    def cellOf(v: org.apache.spark.sql.Column) = {
      val s = PqExprs.centroidCosines(PqExprs.l2normalize(v), centroids)
      (array_position(s, array_max(s)) - 1).cast("int")
    }

    val nodeRows = corpus
      .select(col(idCol).cast("long").as("__id"),
        PqExprs.l2normalize(col(vecCol)).as("__nvec"),
        cellOf(col(vecCol)).as("__cell"))
      .repartition(col("__cell"))
      .sortWithinPartitions("__cell", "__id") // deterministic insert order
      .as[(Long, Array[Double], Int)]
      .mapPartitions { it =>
        val graphs = mutable.LinkedHashMap.empty[Int, Hnsw]
        it.foreach { case (id, vec, cell) =>
          graphs.getOrElseUpdate(cell,
            new Hnsw(dim, hnswM, efConstruction, seed ^ cell))
            .insert(id, vec)
        }
        graphs.iterator.flatMap { case (cell, g) =>
          g.dump().map(n =>
            (cell, n.id, n.vec, n.level, n.neighbors.map(_.toSeq).toSeq,
              n.isEntry, false))
        }
      }
      .toDF("cell", "id", "vec", "level", "neighbors", "is_entry",
        "is_centroid")

    val centroidRows = centroids.zipWithIndex.map { case (c, i) =>
      (-1, i.toLong, c, -1, Seq.empty[Seq[Long]], false, true)
    }.toSeq.toDF("cell", "id", "vec", "level", "neighbors", "is_entry",
      "is_centroid")
    nodeRows.unionByName(centroidRows)
  }

  /** Incrementally extend a [[buildHnswIndex]] DataFrame with new vectors —
    * no full rebuild. New rows are assigned to cells by the index's OWN
    * persisted centroids (the coarse quantizer is frozen at build time, the
    * standard IVF append contract), then one shuffle co-locates each cell's
    * existing graph nodes with its pending inserts; per cell the graph is
    * restored (adjacency verbatim) and the new vectors are inserted with the
    * normal HNSW procedure. Cost is proportional to the APPENDED data —
    * O(|additions| · log corpus) inserts plus a scan of the touched index —
    * which is what daily training-data ingest needs at 100 TB: the
    * alternative (rebuild) re-pays the whole corpus every batch.
    *
    * Appended graphs are not bit-identical to a from-scratch build (insert
    * order differs; HNSW is order-robust by design) — recall bounds, not
    * graph bytes, are the contract ([[SimilaritySpec]] asserts them).
    * Duplicate ids are the caller's concern, as with any append-only sink.
    */
  def appendToHnswIndex(index: DataFrame, additions: DataFrame,
      hnswM: Int = 16, efConstruction: Int = 100, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expr.PqExprs
    val spark = index.sparkSession
    import spark.implicits._

    val centroidRows = index.filter(col("is_centroid"))
    val centroids: Array[Array[Double]] = centroidRows
      .select(col("id"), col("vec")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    val dim = centroids(0).length

    def cellOf(v: org.apache.spark.sql.Column) = {
      val s = PqExprs.centroidCosines(PqExprs.l2normalize(v), centroids)
      (array_position(s, array_max(s)) - 1).cast("int")
    }

    // pending inserts ride the node schema with level = -2 (real nodes have
    // level >= 0), so one repartition co-locates them with their cell
    val pending = additions.select(
      cellOf(col(vecCol)).as("cell"),
      col(idCol).cast("long").as("id"),
      PqExprs.l2normalize(col(vecCol)).as("vec"),
      lit(-2).as("level"),
      typedLit(Seq.empty[Seq[Long]]).as("neighbors"),
      lit(false).as("is_entry"))

    val appended = index.filter(!col("is_centroid"))
      .select(col("cell"), col("id"), col("vec"), col("level"),
        col("neighbors"), col("is_entry"))
      .unionByName(pending)
      .repartition(col("cell"))
      .as[(Int, Long, Array[Double], Int, Seq[Seq[Long]], Boolean)]
      .mapPartitions { it =>
        val nodes = mutable.LinkedHashMap
          .empty[Int, mutable.ArrayBuffer[Hnsw.Node]]
        val adds = mutable.LinkedHashMap
          .empty[Int, mutable.ArrayBuffer[(Long, Array[Double])]]
        it.foreach { case (cell, id, vec, level, nbrs, isEntry) =>
          if (level == -2)
            adds.getOrElseUpdate(cell, mutable.ArrayBuffer.empty) +=
              ((id, vec))
          else
            nodes.getOrElseUpdate(cell, mutable.ArrayBuffer.empty) +=
              Hnsw.Node(id, vec, level, nbrs.map(_.toArray).toArray, isEntry)
        }
        (nodes.keySet ++ adds.keySet).iterator.map { cell =>
          val g = nodes.get(cell) match {
            case Some(ns) => Hnsw.restore(dim, ns.toSeq, hnswM,
              efConstruction, seed ^ cell)
            case None => new Hnsw(dim, hnswM, efConstruction, seed ^ cell)
          }
          // deterministic insert order for a given batch
          adds.get(cell).foreach(_.sortBy(_._1).foreach {
            case (id, vec) => g.insert(id, vec)
          })
          cell -> g
        }.flatMap { case (cell, g) =>
          g.dump().map(n =>
            (cell, n.id, n.vec, n.level, n.neighbors.map(_.toSeq).toSeq,
              n.isEntry, false))
        }
      }
      .toDF("cell", "id", "vec", "level", "neighbors", "is_entry",
        "is_centroid")
    appended.unionByName(centroidRows.select(
      col("cell"), col("id"), col("vec"), col("level"), col("neighbors"),
      col("is_entry"), col("is_centroid")))
  }

  /** Query a [[buildHnswIndex]] DataFrame (typically re-read from parquet):
    * restore only the probed cells' graphs — the `cell isin probes` filter
    * prunes unread cells at the parquet scan — and search. Restoration
    * copies adjacency verbatim, so results are identical to querying the
    * just-built graphs.
    */
  def searchHnswIndex(index: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 4, ef: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdOut: String = "query_id"): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._

    val centroids: Array[Array[Double]] = index
      .filter(col("is_centroid"))
      .select(col("id"), col("vec"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val dim = centroids(0).length

    val qRows: Array[(Long, Array[Double], Array[Int])] = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map { r =>
        val qv = Pq.normalize(r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
        val cs = centroids.indices
          // rank probe cells by COSINE (dot over the centroid norm):
          // corpus rows were assigned by centroidCosines, and Lloyd
          // means are never unit-norm — a raw-dot ranking probes a
          // DIFFERENT cell set than the one the corpus partitioned by
          .map { i =>
            val d = centroids(i).zip(qv).map(t => t._1 * t._2).sum
            val cn = math.sqrt(centroids(i).map(x => x * x).sum)
            i -> (if (cn > 0.0) d / cn else 0.0)
          }
          .sortBy { case (i, s) => (-s, i) }
          .take(nProbe).map(_._1).toArray
        (r.getLong(0), qv, cs)
      }
    val byCell: Map[Int, Array[(Long, Array[Double])]] = qRows
      .flatMap { case (qid, qv, cells) => cells.map(c => c -> (qid, qv)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val bq = spark.sparkContext.broadcast(byCell)
    val probedCells = byCell.keys.toSeq

    val candidates = index
      .filter(!col("is_centroid") && col("cell").isin(probedCells: _*))
      .select(col("cell"), col("id"), col("vec"), col("level"),
        col("neighbors"), col("is_entry"))
      .repartition(col("cell"))
      .as[(Int, Long, Array[Double], Int, Seq[Seq[Long]], Boolean)]
      .mapPartitions { it =>
        val probed = bq.value
        val nodesByCell = mutable.LinkedHashMap
          .empty[Int, mutable.ArrayBuffer[Hnsw.Node]]
        it.foreach { case (cell, id, vec, level, nbrs, isEntry) =>
          nodesByCell.getOrElseUpdate(cell, mutable.ArrayBuffer.empty) +=
            Hnsw.Node(id, vec, level, nbrs.map(_.toArray).toArray, isEntry)
        }
        nodesByCell.iterator.flatMap { case (cell, nodes) =>
          val g = Hnsw.restore(dim, nodes.toSeq)
          probed(cell).iterator.flatMap { case (qid, qv) =>
            g.search(qv, k + 1, ef)
              .filter(_._1 != qid)
              .map { case (id, cos) => (qid, id, cos) }
          }
        }
      }
      .toDF(queryIdOut, idCol, "cosine")

    exactTopK(candidates, k, idCol, queryIdOut)
  }

  /** All-pairs near-duplicate detection by embedding cosine: LSH-bucket the
    * corpus against itself, score within buckets, keep pairs with
    * cosine >= `threshold`. Used for embedding-based near-dedup.
    *
    * `nTables` is OR-amplification (E2LSH / FAISS-binary style): a pair is
    * a candidate if it collides in ANY of `nTables` independent
    * `nPlanes`-bit hash tables, so per-pair recall is 1-(1-p^b)^L for
    * per-plane collision probability p — a single AND-only table
    * (`nTables = 1`, the old shape) has recall p^b, which collapses for
    * moderate-cosine pairs (p=0.63 at cosine 0.4 ⇒ 2.5% at b=8).
    *
    * Scale shape mirrors [[Dedup.minhashCandidates]]: the exploded
    * table/bucket stream carries ONLY (table, bucket, id) — never vectors —
    * vectors equi-join back in once per unique surviving pair for exact
    * verification. `maxBucketSize` caps pathological buckets before the
    * pair expansion goes quadratic (clustered LLM embedding corpora put
    * whole near-dup shards in one bucket: 1% of 10^9 vectors is 10^14
    * pairs); the guard is the capped-collect aggregation of
    * [[Dedup.bucketPairs]] — ONE bucket-keyed aggregation whose partial
    * state never exceeds cap+1 ids, with pairs expanding LOCALLY from
    * each surviving bucket array — replacing the former window count
    * (full sort of the banded stream) + band self-join (two more
    * shuffles).
    *
    * Preconditions: `idCol` is unique per row (the verify tail
    * reassembles each pair's two sides by id — see the
    * [[graft.operators.Dedup]] family contract) and NON-NULL (the
    * capped collect skips null payloads, where the former window count
    * counted null-id rows toward bucket size — a bucket pushed over
    * `maxBucketSize` only by null ids would now expand instead of
    * dropping whole).
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
      nPlanes: Int = 10, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Int = 1000, nTables: Int = 1): DataFrame = {
    val vecs = corpus.select(col(idCol), col(vecCol))
    val tableBuckets = array((0 until nTables).map { t =>
      VectorFunctions.hyperplaneBucket(col(vecCol),
        VectorFunctions.randomPlanes(nPlanes, dim, seed + t * 7919L))
    }: _*)
    // key column named apart from bucketPairs' internal __bucket
    // collect alias — AMBIGUOUS_REFERENCE otherwise
    val banded = vecs
      .select(col(idCol), posexplode(tableBuckets).as(Seq("__table", "__bkt")))
    // capped-collect bucket guard + LOCAL pair expansion (the MinHash
    // tier's [[Dedup.bucketPairs]] design): one aggregation replaces the
    // former window-count (full sort of the banded stream) + band
    // self-join (two more shuffles) — the identical pair SET for
    // non-null ids (the scaladoc precondition): buckets of size in
    // (1, maxBucketSize] expand i<j locally, oversized buckets drop via
    // the cap+1 overflow signal exactly as the window filter dropped
    // them.
    val pairIds = Dedup.bucketPairs(banded, Seq("__table", "__bkt"),
        col(idCol), maxBucketSize)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // one corpus probe, not two: unpivot each pair into (pair, side, id),
    // join the vector frame once, regroup — the regroup shuffle carries
    // only CANDIDATE vectors (same shape as the minhash/ICWS verify tails)
    val pairSides = pairIds
      .select(struct(col("id_a"), col("id_b")).as("__pk"),
        explode(array(
          struct(lit("a").as("__side"), col("id_a").as(idCol)),
          struct(lit("b").as("__side"), col("id_b").as(idCol))))
          .as("__s"))
      .select(col("__pk"), col("__s.__side").as("__side"),
        col("__s." + idCol).as(idCol))
    pairSides.join(vecs, Seq(idCol))
      .groupBy(col("__pk"))
      .agg(max(when(col("__side") === "a", col(vecCol))).as("__va"),
        max(when(col("__side") === "b", col(vecCol))).as("__vb"))
      .withColumn("cosine", cosineSim(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("__pk.id_a").as("id_a"), col("__pk.id_b").as("id_b"),
        col("cosine"))
  }

  /** Exact all-pairs cosine edges at or above `threshold` — the recall
    * baseline for [[nearDupPairs]] and the verification path of
    * [[semanticDedup]]. O(n^2 / cores): the probe side is spread across
    * `defaultParallelism` partitions so a single-file parquet corpus (one
    * 128MB-split task) still uses the whole machine. Verification-scale
    * only — at 100 TB the LSH path is the only viable pair generator.
    *
    * The build side is broadcast only while Catalyst's plan-statistics
    * estimate says it fits (`maxBroadcastBytes`, default 512MB — far under Spark's 8GB
    * broadcast hard limit and a sane driver/executor footprint): an
    * unconditional `broadcast()` hint bypasses
    * autoBroadcastJoinThreshold, so a corpus past driver memory would
    * CRASH the method where the pre-guard behavior merely ran it slowly.
    * Past the cap both sides are repartitioned to `par` and the hint is
    * dropped — the cartesian plan then has par x par splits, so the
    * quadratic work still spreads across every core.
    */
  def exactCosinePairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
      .repartition(par)
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    // size the build side from Catalyst's own plan statistics — the
    // same estimate Spark's planner consults for its broadcast
    // decision, and FREE (no job; an aggregate pre-pass measured +0.35s
    // on the sub-second x36, a whole extra job to guard a 550KB frame).
    // Estimation errors are safe in both directions: an overestimate
    // (post-join stats multiply) merely drops the hint and runs the
    // par x par fallback; scan-backed estimates (the normal case for a
    // corpus) come from file sizes and cannot be orders-of-magnitude low
    val estBytes = b.queryExecution.optimizedPlan.stats.sizeInBytes
    // broadcast b EXPLICITLY when it fits: with no hint the planner may
    // broadcast the repartitioned side instead and stream b — whose
    // single-row-group parquet scan is ONE task, so the whole O(n^2)
    // comparison collapses onto one core (observed: 60k vectors = 1.8B
    // dot products wedged a soak run serially). Pinning b as the build
    // side makes a's `par` partitions the streamed side, and the
    // widening actually widens.
    val joined =
      if (estBytes <= BigInt(maxBroadcastBytes))
        a.join(broadcast(b), col("id_a") < col("id_b"))
      else a.join(b.repartition(par), col("id_a") < col("id_b"))
    joined
      .withColumn("cosine", cosineSim(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): documents whose embedding cosine is >= `threshold`
    * are semantic duplicates; duplicate groups close transitively; ONE
    * representative (the minimum id, matching [[Dedup.minhashDedupCC]]'s
    * keep-min convention) survives per group. Extends the reference's
    * D1-style dedup (`/root/reference/src/pipeline.py:49-75`) from key
    * equality to embedding-space equivalence.
    *
    * Pair generation is pluggable:
    *  - `exact = false` (default, the 100 TB path): OR-amplified hyperplane
    *    LSH ([[nearDupPairs]]) — shuffles carry (table, bucket, id) only,
    *    hot buckets are capped, and the band exchange is reused; recall
    *    follows the OR-of-AND s-curve, so pairs comfortably above the
    *    threshold are found w.h.p. and the groups match the exact graph.
    *    SIZE `nPlanes` to the corpus: there are 2^nPlanes buckets per
    *    table and the cap drops buckets above `maxBucketSize`, so the
    *    guard rail is `2^nPlanes >= corpusRows / maxBucketSize` — at the
    *    fixture-scale default (nPlanes = 3: 8 buckets x 1000 cap ≈ 8k
    *    rows) a MILLION-row corpus overflows every bucket and the dedup
    *    silently no-ops. The cap is the same capped-collect guard as the
    *    MinHash tier; the sizing responsibility is the caller's because
    *    bucket geometry is part of the recall contract, not a tunable
    *    the operator may silently change.
    *  - `exact = true` (verification / small corpora): [[exactCosinePairs]].
    *
    * Component resolution reuses [[Dedup.connectedComponents]]: bounded
    * driver union-find when the duplicate graph is small (the usual case —
    * dup rate bounds edges), distributed hash-to-min beyond.
    */
  /** Hyperplane count sizing for the LSH dedup family: enough planes
    * that the EXPECTED bucket occupancy is ~`targetBucket` rows
    * (`2^planes >= rows / targetBucket`), floored at `floor` so small
    * corpora keep today's geometry and capped at `cap` (65k buckets —
    * past that, per-bucket occupancy is dominated by true duplicate
    * clusters, which more planes cannot split). This is the guard the
    * sf3 rung made concrete: candidate-pair volume inside a bucket is
    * QUADRATIC in its occupancy, so a fixed plane count that merely
    * clears the hot-bucket cap rail (`2^planes >= rows / maxBucketSize`,
    * cap 1000) still admits ~rows x cap / 2 candidate pairs — measured
    * as a 813 s / 57 GB-spill collapse of a 180k-row semantic dedup that
    * sizing to ~32-row buckets turns into routine id-only shuffles.
    * Recall of TRUE duplicate pairs is unaffected by plane count when
    * duplicates are near-colinear (their sign patterns agree on every
    * plane); borderline-threshold pairs follow the OR-of-AND s-curve,
    * so callers needing high recall near the threshold should raise
    * `nTables` alongside planes, not lower the plane count.
    */
  def recommendedPlanes(rows: Long, targetBucket: Int = 32,
      floor: Int = 8, cap: Int = 16): Int = {
    require(rows >= 0 && targetBucket > 0)
    val needed = math.ceil(
      math.log(math.max(rows, 1L).toDouble / targetBucket) /
        math.log(2.0)).toInt
    math.min(cap, math.max(floor, needed))
  }

  def semanticDedup(corpus: DataFrame, threshold: Double,
      exact: Boolean = false, nPlanes: Int = 3, nTables: Int = 12,
      dim: Int = 64, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", maxBucketSize: Int = 1000): DataFrame = {
    val pairs =
      if (exact) exactCosinePairs(corpus, threshold, idCol, vecCol)
      else nearDupPairs(corpus, threshold, nPlanes, dim, seed, idCol, vecCol,
        maxBucketSize, nTables)
    val comps = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Cluster-balanced diversity sampling — the density-equalizing selection
    * step of embedding-space curation (the SemDeDup/SSL-prototypes family):
    * k-means cells partition the corpus, and each cell contributes its
    * `perCluster` most PROTOTYPICAL members (highest cosine to the cell's
    * own centroid, smallest-id tiebreak). Head clusters (boilerplate-dense
    * regions) are capped to the same budget as tail clusters, so the
    * sample covers the embedding space instead of its density peaks.
    *
    * Scale shape: centroids train on a bounded sample ([[Pq.lloyd]], cost
    * independent of corpus size); assignment + prototypicality is ONE
    * shuffle-free projection ([[graft.functions.expr.PqExprs
    * .centroidCosines]]: norm computed once, centroids baked into the
    * expression); selection is ONE aggregation with the bounded
    * [[graft.functions.Aggregators.TopByScore]] buffer — the shuffle
    * carries one <= perCluster buffer per (partition, cell), never a
    * cell's membership, and no Window ever sorts a hot cell in one task.
    * Output: (idCol, cell, proto) — deterministic for a fixed seed under
    * any partitioning.
    */
  def diversitySample(corpus: DataFrame, perCluster: Int,
      nClusters: Int = 16, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", trainSample: Int = 10000): DataFrame =
    diversitySampleWith(corpus, perCluster, nClusters, seed, idCol, vecCol,
      trainSample)._1

  /** [[diversitySample]] plus the full per-row assignment frame
    * (id, cell, proto) — for law verification and diagnostics; both frames
    * derive from the SAME trained centroids.
    */
  def diversitySampleWith(corpus: DataFrame, perCluster: Int,
      nClusters: Int = 16, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainSample: Int = 10000): (DataFrame, DataFrame) = {
    require(perCluster > 0)
    val sample = trainVectors(corpus, idCol, vecCol, trainSample)
    val centroids = Pq.lloyd(sample, nClusters, iters = 5, seed = seed)
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("__scores",
        graft.functions.expr.PqExprs.centroidCosines(col(vecCol), centroids))
      .select(col(idCol),
        (array_position(col("__scores"), array_max(col("__scores"))) - 1)
          .cast("int").as("cell"),
        array_max(col("__scores")).as("proto"))
    val picks = assigned
      .groupBy(col("cell"))
      .agg(graft.functions.Aggregators.topByScore(
        col("proto"), col(idCol), perCluster).as("__top"))
      .select(col("cell"),
        explode(arrays_zip(col("__top._1"), col("__top._2"))).as("__p"))
      .select(col("__p._2").cast("long").as(idCol), col("cell"),
        col("__p._1").as("proto"))
    (picks, assigned)
  }

  /** Label-conditioned outlier mining — embedding-space QA for labeled
    * training data: the `k` vectors per label LEAST similar to their own
    * label's centroid (cosine), the standard screen for mislabeled or
    * off-distribution examples before a labeled set is trusted.
    *
    * Scale shape: the per-label centroid is ONE algebraic aggregation
    * ([[graft.functions.Aggregators.VecSum]] — a fixed dim-sized buffer
    * per (partition, label) crosses the shuffle, never a (label, dim)
    * row explosion); the bounded label->centroid table collects and
    * rides the task binary into one native scoring pass
    * ([[graft.functions.expr.PqExprs.centroidCosines]], vector norm
    * computed once per row); per-label top-k is a rank window the
    * optimizer executes as WindowGroupLimit — partial per-task top-k
    * before the sort, no label's full membership in one task.
    * Determinism: similarity is 4dp-rounded BEFORE ranking with the id
    * tiebreak (the x54/x68 cross-engine contract — centroid sums are
    * order-sensitive in the last ulps).
    */
  def labelOutliers(corpus: DataFrame, k: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k > 0 && dim > 0, "k, dim must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = corpus
      .select(col(labelCol).cast("long").as(labelCol),
        col(vecCol).cast("array<double>").as("__v"))
      // unlabeled rows can't belong to a label centroid — and the
      // null-label group's collected row would NPE getLong below
      .where(col("__v").isNotNull && col(labelCol).isNotNull)
      .groupBy(col(labelCol))
      .agg(graft.functions.Aggregators.vecSum(dim, col("__v")).as("__m"))
      .collect() // bounded: one row per label
      .map { r =>
        val m = r.getStruct(1)
        val n = m.getLong(0)
        (r.getLong(0), m.getSeq[Double](1).map(_ / n).toArray)
      }
      .sortBy(_._1)
    val centroids = cents.map(_._2)
    val idx = cents.zipWithIndex
      .map { case ((lbl, _), i) => (lbl, i + 1) }.toSeq
      .toDF(labelCol, "__ci")
    val scored = corpus
      // null vectors are excluded from the centroid AND from ranking — a
      // null similarity would sort NULLS FIRST under Spark's ASC and
      // masquerade as the worst outlier (DuckDB sorts them last)
      .where(col(vecCol).isNotNull)
      .join(broadcast(idx), Seq(labelCol))
      .select(col(labelCol).cast("long").as(labelCol), col(idCol),
        round(element_at(graft.functions.expr.PqExprs.centroidCosines(
          col(vecCol), centroids), col("__ci")), 4).as("sim"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col(labelCol))
        .orderBy(col("sim").asc, col(idCol).asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col(labelCol), col(idCol), col("sim"), col("rank"))
  }
}
