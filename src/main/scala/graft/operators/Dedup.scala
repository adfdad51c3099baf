package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication operators for training-data pipelines
  * (extension tier, SURVEY.md §7.4; the reference's only dedup is the
  * latest-record window, [[DedupLatest]]).
  *
  * Shared scale design: every operator reduces to hash-partitioned
  * `groupBy`/join on a derived key (content hash, fingerprint, LSH band
  * bucket), so the shuffle volume is O(rows), never O(rows^2); candidate
  * pair generation is confined to within-bucket joins.
  *
  * Shared precondition: `idCol` is UNIQUE per row. The whole family's
  * semantics assume it (the greedy min-id survivor rule, incremental
  * state folds, and the single-probe verify tails that reassemble a
  * candidate pair's two sides by id all pick one row per id); run
  * [[exact]] or assign a surrogate id first for corpora that violate it.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` per identical `textCol`.
    * The shuffle key is a 64-bit content hash, not the full text — at 100 TB
    * the shuffle carries 8-byte keys + ids, and the winner row is recovered
    * by a self-semi-join on id. `min_by` gives map-side partial aggregation.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = xxhash64(col(textCol))
    val winners = df
      .select(col(idCol), h.as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Homoglyph-robust exact dedup: keep the smallest `idCol` per
    * confusable-SKELETON-identical text
    * ([[graft.functions.expr.ConfusableSkeletonExpr]] composed over the
    * x02 whitespace/case normalization). Catches the adversarial
    * duplicate class plain normalization misses — spam/SEO copies that
    * swap Latin letters for identical-looking Cyrillic/Greek code points
    * or salt text with zero-width joiners to slip past exact and shingle
    * dedup alike (the shingles differ bytewise too). Same scale shape as
    * [[exact]]: the shuffle key is the 64-bit hash of the skeleton.
    */
  def homoglyphDedup(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // skeleton FIRST: zero-width strips and exotic-space mappings must
    // land before whitespace collapsing sees the text
    val skeleton = lower(trim(regexp_replace(
      graft.functions.expr.ConfusableExprs.confusableSkeleton(
        col(textCol)), "\\s+", " ")))
    val winners = df
      .select(col(idCol), xxhash64(skeleton).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Cross-corpus exact dedup: drop every `corpus` document whose text
    * appears in `reference` — the fine-tuning-vs-pretraining overlap
    * removal (and eval-set exact leakage check) of a training-data
    * pipeline. Unlike [[exact]] this removes nothing WITHIN `corpus`;
    * compose both for a full clean.
    *
    * Scale shape — bloom-pruned anti join: the reference collapses to a
    * driver-built [[org.apache.spark.util.sketch.BloomFilter]] over
    * 64-bit content hashes (two reference passes: count for sizing unless
    * `expectedRefItems` is given, then the filter aggregate), and the
    * probe rides the corpus scan row-locally. Bloom negatives — the
    * overwhelming majority at real overlap rates — are PROVEN unique
    * (no false negatives) and never shuffle; only bloom positives
    * (true dups + fpp) enter the exact hash anti join that kills false
    * positives, so the shuffled volume is overlap-bounded, not
    * corpus-bounded. At 1% fpp the filter costs ~1.2 bytes/reference doc:
    * fine to 10^8-10^9 docs; past `maxBloomItems` the operator falls back
    * to the plain hash anti join (same result, corpus-wide shuffle) —
    * at that reference scale the broadcast would dominate.
    *
    * Same 64-bit-collision convention as [[exact]]: equality is hash
    * equality; a 2^-64 collision drops a unique doc.
    */
  def crossExactDedup(corpus: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, fpp: Double = 0.01,
      expectedRefItems: Long = -1L,
      maxBloomItems: Long = 1L << 28): DataFrame = {
    val h = xxhash64(col(textCol))
    val refHashes = reference.select(h.as("__h"))
    val nRef =
      if (expectedRefItems > 0) expectedRefItems else refHashes.count()
    if (nRef == 0) return corpus
    if (nRef > maxBloomItems) {
      // reference too big for a driver bloom: one exact anti join
      return corpus.withColumn("__h", h)
        .join(refHashes, Seq("__h"), "left_anti").drop("__h")
    }
    val bloom = refHashes.stat.bloomFilter("__h", nRef, fpp)
    val probe =
      graft.functions.expr.BloomExprs.mightContainLong(h, bloom)
    // bloom negatives are proven-unique: scan-local, never shuffled
    val clean = corpus.filter(!probe)
    // bloom positives verify exactly (kills the fpp false positives)
    val survivedCands = corpus.filter(probe).withColumn("__h", h)
      .join(refHashes, Seq("__h"), "left_anti").drop("__h")
    clean.unionByName(survivedCands)
  }

  /** Normalized exact dedup: same, over whitespace/case-normalized text. */
  def normalized(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = TextFunctions.fingerprint64(col(textCol))
    val winners = df
      .select(col(idCol), h.as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Word shingles (k-grams) of a text column as `array<string>` (debug /
    * exact-verification view; the hot path hashes shingles without
    * materializing them — see [[shingleHashes]]).
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** 64-bit hashes of the k-shingle set (deduplicated, sorted): native
    * expression ([[graft.functions.expr.ShingleHashesExpr]]) — one primitive
    * loop per document instead of per-shingle lambda interpretation.
    */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.expr.TextHashExprs.shingleHashes(
      TextFunctions.tokens(text), k)

  /** k-shingle hashes of `textCol`, dispatching on the column's type:
    * raw string text (tokenize + shingle), pre-tokenized `array<string>`
    * (shingle only — see [[TextFunctions.tokensOf]] for why pipelines
    * share one tokenization), or pre-hashed `array<bigint>` shingles
    * (passed through).
    */
  def shinglesOf(df: DataFrame, textCol: String, k: Int): Column =
    df.schema(textCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => col(textCol)
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) =>
        graft.functions.expr.TextHashExprs.shingleHashes(col(textCol), k)
      case _ => shingleHashes(col(textCol), k)
    }

  /** MinHash signature of a shingle-hash array: `numHashes` independent hash
    * functions realized as seed-mixed xxhash64 re-hashes of each shingle
    * hash, taking the min per function (Broder 1997). Seeded re-hashing
    * avoids multiply-add wraparound, which ANSI mode (Spark 4 default)
    * rejects as long overflow. Native expression
    * ([[graft.functions.expr.MinHashSignatureExpr]]).
    */
  def minhashSignature(shingleHashesCol: Column, numHashes: Int,
      seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val seeds = Array.fill(numHashes)(rng.nextLong())
    graft.functions.expr.TextHashExprs.minhashSignature(shingleHashesCol, seeds)
  }

  /** Top-`topN` most document-frequent shingle hashes of a corpus —
    * boilerplate detection (shared headers/footers/licenses). Computed as a
    * distributed explode + groupBy (shingleHashes is per-doc deduplicated, so
    * the count IS document frequency), then collected bounded: boilerplate is
    * by nature a small set of very frequent shingles, so `topN` stays tiny
    * regardless of corpus size.
    *
    * Feeding the result into [[minhashCandidates]]'s `bannedShingles` is the
    * df-weighting defence for highly-templated corpora: shared boilerplate
    * otherwise floods LSH buckets with false candidates (and `maxBucketSize`
    * would start dropping real ones).
    */
  def frequentShingleHashes(df: DataFrame, textCol: String,
      shingleK: Int = 3, topN: Int = 100,
      minDocFrac: Double = 0.1): Array[Long] = {
    val total = df.count()
    val minDocs = math.max(2L, (total * minDocFrac).toLong)
    df.select(explode(shingleHashes(col(textCol), shingleK)).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .orderBy(desc("__df"), col("__h"))
      .limit(topN)
      .select("__h")
      .collect().map(_.getLong(0))
  }

  /** Within-bucket candidate pairs with a degenerate-bucket guard, shared
    * by the LSH candidate generators. Emits every unordered pair of
    * `payload` values sharing a bucket key, for buckets whose size is in
    * (1, maxBucketSize] — as `(__pair_a, __pair_b)` with
    * `__pair_a < __pair_b`. A bucket of b docs yields b² candidate pairs,
    * so unbounded buckets are the one place LSH can go quadratic — and on
    * a templated corpus a boilerplate mega-bucket shows up with DEFAULT
    * arguments, so the guard must be scale-safe without opt-in tuning.
    *
    * Shape — ONE aggregation, no window, no self-join:
    *
    *  1. `collect_capped(payload, cap)` per bucket key
    *     ([[graft.functions.expr.CappedCollect]]): the buffer is hard-capped
    *     at cap+1 elements in the partial (map-side) aggregate, in every
    *     merge, and in the final aggregate, so NO task ever holds more
    *     than cap+1 rows of any bucket — a mega-bucket costs O(rows)
    *     streamed work and O(cap) memory. (The former window-count guard
    *     buffered one whole bucket per WindowExec task BEFORE the size was
    *     known: a boilerplate mega-bucket was a straggler/spill before
    *     `maxBucketSize` could drop it. A pre-count + anti-join variant
    *     fixed memory but re-ran the tokenise/shingle/signature kernel per
    *     plan branch — Catalyst specializes each branch's projection, so
    *     their exchanges never canonicalize equal and ReuseExchange can't
    *     dedup them: measured a full extra kernel pass at sf0.1.)
    *  2. `size BETWEEN 2 AND cap` on the collected array: size cap+1 IS
    *     the over-cap signal (see [[graft.functions.expr.AggExprs
    *     .collectCapped]]), so this is exactly the old
    *     "1 < bucket size <= cap" predicate.
    *  3. Pairs explode LOCALLY from each surviving (<= cap element)
    *     array — combinations i<j via posexplode + slice — replacing the
    *     band self-join: zero extra shuffle, and the expensive signature
    *     subtree sits under the single aggregation exchange, evaluated
    *     exactly once.
    *
    * Equal payloads (duplicate ids in a dirty input) are dropped, matching
    * the self-join's strict `a < b`.
    */
  private[operators] def bucketPairs(banded: DataFrame, keys: Seq[String],
      payload: Column, maxBucketSize: Int): DataFrame = {
    val keyCols = keys.map(col)
    val collected = banded
      .groupBy(keyCols: _*)
      .agg(graft.functions.expr.AggExprs
        .collectCapped(payload, maxBucketSize).as("__bucket"))
      .filter(size(col("__bucket")).between(2, maxBucketSize))
    expandBucketPairs(collected)
  }

  /** Step 3 of [[bucketPairs]], reusable by callers that already HOLD
    * the collected buckets (e.g. the guarded-blocking ledger, whose one
    * aggregation collects members and counts sizes together): unordered
    * pairs i<j from each row's `__bucket` array, expanded LOCALLY via
    * posexplode + slice — zero shuffles. Callers guarantee every array
    * is a complete (uncapped) bucket.
    */
  private[operators] def expandBucketPairs(collected: DataFrame)
      : DataFrame =
    collected
      .select(col("__bucket"),
        posexplode(col("__bucket")).as(Seq("__i", "__a")))
      // partners after position __i: slice is 1-indexed, so element __i+2
      // onward; explode drops the empty tail slice of the last element
      .select(col("__a"),
        explode(slice(col("__bucket"), col("__i") + lit(2),
          size(col("__bucket")) - col("__i") - lit(1))).as("__b"))
      .select(least(col("__a"), col("__b")).as("__pair_a"),
        greatest(col("__a"), col("__b")).as("__pair_b"))
      .filter(col("__pair_a") =!= col("__pair_b"))

  /** Candidate near-duplicate pairs via MinHash LSH banding: the signature is
    * split into `bands` bands of `rowsPerBand` values; documents sharing any
    * band hash become candidates (within-bucket join), then candidates are
    * verified with exact Jaccard over shingle sets. Returns
    * `(idCol_a, idCol_b, jaccard)` with idCol_a < idCol_b and
    * jaccard >= `threshold`.
    *
    * Scale: explode factor is `bands` per doc, but the banded/joined stream
    * carries ONLY (band, bandHash, id) — 24 bytes a row — never the shingle
    * arrays; arrays are fetched by two id-equi-joins only for the surviving
    * deduplicated candidate pairs, so shuffle volume is
    * O(bands*rows*24B + pairs + shingleData), not O(bands*shingleData).
    * `maxBucketSize` caps pathological buckets (boilerplate collisions) —
    * a standard guard: a bucket of b docs yields b^2 pairs, so unbounded
    * buckets are the one place LSH can go quadratic.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 1000,
      seed: Long = 42L, bannedShingles: Array[Long] = Array.empty): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    // boilerplate suppression: drop banned (document-frequent) shingles
    // before signatures/verification; a doc that is ALL boilerplate keeps
    // its original shingles (empty sets have no meaningful signature).
    // shinglesOf: textCol may be raw text OR a shared pre-tokenized /
    // pre-shingled array (pipelines tokenize once)
    val rawSh = shinglesOf(df, textCol, shingleK)
    val shCol =
      if (bannedShingles.isEmpty) rawSh
      else {
        val filtered = array_except(rawSh,
          typedLit(bannedShingles.toSeq))
        when(size(filtered) > 0, filtered).otherwise(rawSh)
      }
    // the shingle-hash + signature kernels evaluate in the stage below —
    // make sure an undersplit source doesn't serialize them (no-op at
    // production scale, see Tables.widenForKernel)
    val withSets = graft.Tables.widenForKernel(
      df.select(col(idCol), col(textCol)), col(idCol))
      .withColumn("__sh", shCol)

    val banded = withSets
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes, seed))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        ).as(Seq("__band", "__bandhash")))

    // degenerate-bucket guard + local pair expansion — see [[bucketPairs]]
    // for why this is DEFAULT-safe on templated corpora (no task ever
    // buffers more than maxBucketSize+1 rows of any bucket).
    // `bannedShingles` (fed from [[frequentShingleHashes]]) remains the
    // RECALL lever — banning boilerplate shingles lets real near-dups in
    // templated docs still pair up — but is no longer load-bearing for
    // worst-case task memory. The banded stream (24 B/row: band, hash, id)
    // shuffles once into the capped-collect aggregation; shingle arrays
    // join in afterwards, once per unique surviving pair.
    val pairIds = bucketPairs(banded, Seq("__band", "__bandhash"),
      col(idCol), maxBucketSize)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify WITHOUT a second full-corpus shingle pass: restrict a shingle
    // frame to CANDIDATE docs with a semi-join on candidate ids placed
    // BELOW the shingle projection, so the verify branch tokenizes/hashes
    // only dup-bounded candidate rows — at 100 TB that turns "second
    // shingle pass over the corpus" into "shingle pass over the
    // candidates". `candSets` then joins onto the pair list once per
    // side. The id-keyed repartition under it is load-bearing: the two
    // join branches consume DIFFERENT columns (side a vs side b), so
    // without a shared exchange Catalyst specializes each branch's
    // projection and the semi-join + shingle kernel (and at scale the
    // corpus SCAN under it) execute once per side — r10's x75 vocab-cut
    // lesson. Parking candSets under one id-keyed exchange makes both
    // branches canonicalize onto the SAME shuffle stage (AQE stage cache /
    // ReuseExchange), so candidates are scanned and shingled exactly once
    // in every join mode, at the price of one exchange of dup-bounded
    // candidate rows. No broadcast hint: candidates are dup-bounded, not
    // absolutely bounded — AQE still converts the post-shuffle joins to
    // broadcasts when the candidate set is small. All three references to
    // `pairIds` hang off the SAME dropDuplicates exchange (branches
    // diverge only ABOVE it, unlike the pre-count variant [[bucketPairs]]
    // rejects), so ReuseExchange evaluates the banded kernel once —
    // pinned by PlanQualitySpec.
    // no .distinct() on candIds: the left-semi probe hash-dedups its build
    // side, so a distinct here is a whole extra exchange + aggregate for
    // rows the join deduplicates anyway (2x pairs vs ~1.3x pairs of
    // dup-bounded shuffle volume is noise; the exchange round-trip is not)
    val candIds = pairIds
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
    val candSets = df.select(col(idCol), col(textCol))
      .join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), shCol.as("__sh"))
      .repartition(col(idCol))
    val ca = candSets.as("__ca")
    val cb = candSets.as("__cb")
    val pairs = pairIds
      .join(ca, col("id_a") === col(s"__ca.$idCol"))
      .join(cb, col("id_b") === col(s"__cb.$idCol"))
      .select(col("id_a"), col("id_b"),
        col("__ca.__sh").as("__sh_a"), col("__cb.__sh").as("__sh_b"))

    val inter = size(array_intersect(col("__sh_a"), col("__sh_b")))
    val union = size(col("__sh_a")) + size(col("__sh_b")) - inter
    pairs
      .withColumn("jaccard",
        when(union > 0, inter.cast("double") / union).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-dedup: remove every doc that is a near-duplicate (jaccard >=
    * threshold) of a doc with a smaller id. Greedy min-id survivor rule —
    * one pass, no iterative connected components; at threshold ~0.8+ dup
    * clusters are near-cliques and the greedy rule matches CC for them.
    */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    // no .distinct() on losers: the anti join hash-dedups its build side;
    // a distinct would add an exchange + aggregate to save dup-bounded
    // build rows the join collapses for free
    val losers = minhashCandidates(df, textCol, idCol, shingleK, numHashes,
      bands, threshold, seed = seed)
      .select(col("id_b").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Cross-corpus near-duplicate candidate pairs: corpus docs within
    * MinHash-LSH banding distance of a REFERENCE doc, exact-verified to
    * `(corpus_id, ref_id, jaccard)` with jaccard >= `threshold`. This is
    * the near-dup analogue of [[crossExactDedup]] — the decontamination /
    * benchmark-overlap primitive where byte equality is too strict
    * (near-verbatim test-set rephrasings, whitespace-mangled license
    * text), and the n-gram containment probe ([[TextPipeline]]) too loose
    * (it fires on any shared 13-gram; this requires whole-document
    * resemblance).
    *
    * Scale shape (asymmetric by design — reference = a benchmark/holdout
    * set, orders of magnitude smaller than the corpus):
    *  - both sides band with the SAME seed (signatures must agree), each
    *    banded stream carrying only (bkey, id) — 16 bytes a row;
    *  - reference buckets aggregate under the capped-collect guard (no
    *    task ever buffers more than `maxBucketSize`+1 ref ids of one
    *    bucket; over-cap boilerplate buckets drop, same policy as
    *    [[minhashCandidates]]), and the corpus band stream equi-joins
    *    against them — AQE broadcasts the aggregated reference side in
    *    the common case, so the 100 TB corpus side NEVER shuffles;
    *  - candidate pairs are dup-bounded; shingle sets for exact
    *    verification join in via semi-join-restricted frames, so neither
    *    corpus re-tokenization nor shingle arrays ever cover more than
    *    the candidates.
    */
  def crossMinhashCandidates(corpus: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      maxBucketSize: Int = 1000, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val (_, corpusBanded) = bandBatch(
      graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol)),
      textCol, idCol, shingleK, numHashes, bands, seed)
    val (_, refBanded) = bandBatch(
      reference.select(col(idCol), col(textCol)),
      textCol, idCol, shingleK, numHashes, bands, seed)

    val refBuckets = refBanded.groupBy(col("__bkey"))
      .agg(graft.functions.expr.AggExprs
        .collectCapped(col("id"), maxBucketSize).as("__rids"))
      .filter(size(col("__rids")) <= maxBucketSize)
    val pairIds = corpusBanded
      .join(refBuckets, Seq("__bkey"))
      .select(col("id").as("__cid"), explode(col("__rids")).as("__rid"))
      .dropDuplicates("__cid", "__rid")

    val shC = shinglesOf(corpus, textCol, shingleK)
    val shR = shinglesOf(reference, textCol, shingleK)
    val corpusSets = corpus.select(col(idCol), col(textCol))
      .join(pairIds.select(col("__cid").as(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__cid"), shC.as("__sh_c"))
    val refSets = reference.select(col(idCol), col(textCol))
      .join(pairIds.select(col("__rid").as(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("__rid"), shR.as("__sh_r"))
    val pairs = pairIds
      .join(corpusSets, Seq("__cid"))
      .join(refSets, Seq("__rid"))

    val inter = size(array_intersect(col("__sh_c"), col("__sh_r")))
    val union = size(col("__sh_c")) + size(col("__sh_r")) - inter
    pairs
      .withColumn("jaccard",
        when(union > 0, inter.cast("double") / union).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("__cid").as("corpus_id"), col("__rid").as("ref_id"),
        col("jaccard"))
  }

  /** Shingle-containment pairs: documents whose smaller shingle set is
    * mostly inside the other's — `shared / min(|A|, |B|) >= threshold` —
    * the quote/excerpt/superset detector. This is the case BOTH Jaccard
    * tiers miss by construction: a paragraph quoted inside a 100×-larger
    * document has Jaccard ≈ |small|/|big| ≈ 0.01 (no near-dup threshold
    * reaches it), and winnowing ([[graft.operators.Winnow]]) localizes
    * copied spans but reports fingerprint hits, not the set-containment
    * score dedup policies threshold on.
    *
    * Scale shape (the x64/x65 inverted-index discipline): per-doc
    * DISTINCT shingle hashes explode as (hash, id) — 16 bytes a row,
    * never text; per-hash postings aggregate under the capped-collect
    * guard (boilerplate shingles carried by more than `maxPostings` docs
    * drop with the overflow signal — no task buffers more than cap+1
    * ids); pairs expand locally from surviving postings; set sizes join
    * back by id. Counts are exact integers; the one division per pair is
    * the only float. The oracle replays string shingles — the 64-bit
    * hash convention collides with ~2^-64 probability (x55's documented
    * tradeoff) while keeping 100 TB shuffles narrow.
    */
  def containmentPairs(corpus: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, threshold: Double = 0.8,
      maxPostings: Int = 1000): DataFrame = {
    val postings = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("__cid"),
        explode(shinglesOf(corpus, textCol, shingleK)).as("__g"))
    // set sizes come FREE from size(set) on the base frame — one kernel
    // projection, zero shuffle. The old explode+groupBy recount paid an
    // extra aggregation exchange for a number the array already knows
    // (shinglesOf yields DISTINCT shingles, so size == posting count).
    val sizes = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("__cid"),
        size(shinglesOf(corpus, textCol, shingleK)).cast("long").as("__n"))
    bucketPairs(postings, Seq("__g"), col("__cid"), maxPostings)
      .groupBy(col("__pair_a"), col("__pair_b"))
      .agg(count(lit(1)).cast("long").as("shared"))
      .join(sizes.select(col("__cid").as("__pair_a"),
        col("__n").as("size_a")), Seq("__pair_a"))
      .join(sizes.select(col("__cid").as("__pair_b"),
        col("__n").as("size_b")), Seq("__pair_b"))
      .withColumn("containment", col("shared").cast("double") /
        least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"),
        col("shared"), col("size_a"), col("size_b"), col("containment"))
  }

  /** Cross-corpus containment flags: corpus documents that CONTAIN a
    * reference (benchmark/holdout) document — shared distinct shingles
    * over the REFERENCE doc's shingle count >= `threshold` — as
    * `(corpus_id, ref_id, shared, ref_size, containment)`. This is the
    * leakage shape both cross tiers miss: a benchmark item pasted into a
    * larger page scores Jaccard ≈ |ref|/|page| (x63 never fires) and may
    * dodge the fixed 13-gram probe's n-gram length (x39), while its
    * containment is ≈ 1.0 regardless of the host document's size.
    *
    * Scale shape: both sides explode DISTINCT shingle hashes; the
    * reference posting list per hash aggregates under the capped-collect
    * guard (a boilerplate shingle shared by > `maxPostings` reference
    * docs drops with the overflow signal — documented recall bound, the
    * LSH-bucket policy); the corpus stream equi-joins the aggregated
    * (hash → ref ids) frame — broadcastable for benchmark-sized
    * references, so the corpus never shuffles; pair shared-counts and
    * the ref-size join are candidate-bounded.
    */
  def crossContainment(corpus: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 3,
      threshold: Double = 0.8, maxPostings: Int = 1000): DataFrame = {
    val cPost = graft.Tables.widenForKernel(
        corpus.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("__cid"),
        explode(shinglesOf(corpus, textCol, shingleK)).as("__g"))
    val rPost = reference.select(col(idCol).as("__rid"),
      explode(shinglesOf(reference, textCol, shingleK)).as("__g"))
    // size(set) on the base frame, not an explode+groupBy recount — same
    // cleanup as containmentPairs (shingle sets are distinct by kernel)
    val rSizes = reference.select(col(idCol).as("__rid"),
      size(shinglesOf(reference, textCol, shingleK)).cast("long")
        .as("ref_size"))
    val rBuckets = rPost.groupBy(col("__g"))
      .agg(graft.functions.expr.AggExprs
        .collectCapped(col("__rid"), maxPostings).as("__rids"))
      .filter(size(col("__rids")) <= maxPostings)
    cPost
      .join(rBuckets, Seq("__g"))
      .select(col("__cid"), explode(col("__rids")).as("__rid"))
      .groupBy(col("__cid"), col("__rid"))
      .agg(count(lit(1)).cast("long").as("shared"))
      .join(rSizes, Seq("__rid"))
      .withColumn("containment", col("shared").cast("double") /
        col("ref_size").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("__cid").as("corpus_id"), col("__rid").as("ref_id"),
        col("shared"), col("ref_size"), col("containment"))
  }

  /** Cross-corpus near-dedup: corpus docs that are NOT a near-duplicate
    * (jaccard >= `threshold`) of any reference doc. Unlike the in-corpus
    * [[minhashDedup]] there is no survivor ordering rule — the reference
    * side is never kept, so every matched corpus doc drops.
    */
  def crossMinhashDedup(corpus: DataFrame, reference: DataFrame,
      textCol: String, idCol: String, shingleK: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      maxBucketSize: Int = 1000, seed: Long = 42L): DataFrame = {
    val losers = crossMinhashCandidates(corpus, reference, textCol, idCol,
      shingleK, numHashes, bands, threshold, maxBucketSize, seed)
      .select(col("corpus_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental (batch-folding) near-dedup: dedup each arriving batch
    * against EVERYTHING seen so far, with survivors provably equal to the
    * one-shot greedy [[minhashDedup]] over the concatenated corpus — a doc
    * is removed iff some seen doc with a smaller id is a near-duplicate,
    * and the state keeps ALL seen docs (not just survivors), which is
    * exactly the one-shot rule. Requires ids to be assigned monotonically
    * across batches (the natural ingest order).
    *
    * State is three BUCKETED tables (`<prefix>_bands`, `<prefix>_shingles`,
    * `<prefix>_bucket_counts`), so per-batch cost never re-shuffles history:
    *  - `_bands(__bkey, id)` bucketed on `__bkey` = xxhash64(band,
    *    bandhash): the batch's banded stream repartitions to the same
    *    bucketing and probes WITHOUT exchanging the accumulated band rows
    *    (24 bytes/row x 10^10 rows would otherwise re-shuffle every day).
    *    Joining on the 8-byte `__bkey` instead of (band, bandhash) is
    *    sound: any hash-collision false candidate is killed by the exact
    *    Jaccard verify, same as a band collision would be.
    *  - `_shingles(id, __sh)` bucketed on id: the (small, dup-bounded)
    *    candidate pair list fetches shingle sets for exact verification
    *    without shuffling the stored arrays.
    *  - `_bucket_counts(__bkey, __bcnt)` bucketed on `__bkey`: the running
    *    occupancy of every band bucket, maintained as O(batch) delta rows
    *    per fold (summed bucket-locally at read time, periodically
    *    compacted back to one row per key). The hot-bucket guard sizes
    *    buckets against THIS table, so the `_bands` history is scanned
    *    exactly once per fold — by the candidate join itself — instead of
    *    a second time for a full recount.
    * Appends preserve bucketing (`saveAsTable` append mode), so state
    * maintenance is one write of O(batch) rows per fold per table.
    *
    * The three-table commit is ATOMIC across a mid-fold crash: the
    * fold appends its delta files to all three tables (in any order),
    * then flips a file-list manifest in ONE atomic rename — the
    * manifest, not the table directories, is the committed state. A
    * crash between any two writes leaves unlisted orphan files, which
    * the next fold's [[syncStateToManifest]] sweep reclaims BEFORE any
    * state read, so a reader can never see a torn state (e.g. band rows
    * whose shingle sets are missing — the verify join would silently
    * drop those losers — or a double-counted bucket occupancy that
    * flips the hot-bucket guard near the cap). Pass `foldTag` (e.g. a
    * streaming batch id) for exactly-once across a crash AFTER the
    * manifest flip: a replay whose tag matches the manifest's committed
    * tag skips the fold whole and replays the pinned survivor verdict
    * (read from the MANIFEST-NAMED loser dataset — each attempt writes
    * its own, so an out-of-order replay fails loudly rather than reading
    * a different fold's verdict). Without a tag, replaying an
    * already-committed fold re-appends its rows (the pre-r16 behavior on
    * any replay).
    *
    * Folds on one prefix are serial by contract (ids are monotone across
    * batches) and that contract is ENFORCED: each fold holds a writer
    * token naming its Spark application, so a concurrent fold from a
    * second application is refused loudly instead of having its
    * in-flight appends swept as crash orphans. The token carries a
    * LEASE: the holder refreshes its mtime at every fold phase, and a
    * token stranded by a dead driver becomes claimable (loudly logged)
    * once [[WriterLeaseMissesForTakeover]] leases pass without a
    * heartbeat — unattended pipelines self-heal; the manual
    * [[breakIncrementalDedupWriterLock]] override remains for operators
    * who cannot wait out the lease. Compaction gives concurrent
    * READERS a one-generation retention window: superseded delta files
    * flip to "retired" in the manifest and stay on disk until the next
    * fold's sweep, so a scan planned before the flip finishes cleanly
    * (snapshot-consistent occupancy reads during the window go through
    * [[readBucketCounts]]). Crash-RETRY in a NEW process additionally
    * requires a persistent metastore (the standard deployment for
    * long-lived bucketed state): an in-memory catalog forgets the state
    * tables across JVM restarts while the manifest and data files
    * survive, which the sweep refuses loudly. Pre-manifest legacy state
    * (tables without a manifest or protocol marker) is never silently
    * reclaimed: the sweep fails loudly and [[adoptIncrementalDedupState]]
    * migrates it, preserving the accumulated history.
    */
  def incrementalMinhashDedup(batch: DataFrame, statePrefix: String,
      textCol: String, idCol: String, shingleK: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      seed: Long = 42L, buckets: Int = 8,
      maxBucketSize: Int = 1000, foldTag: Option[String] = None): DataFrame =
    incrementalMinhashDedupImpl(batch, statePrefix, textCol, idCol,
      shingleK, numHashes, bands, threshold, seed, buckets, maxBucketSize,
      foldTag, crashAfterWrites = Int.MaxValue)

  /** [[incrementalMinhashDedup]] with a crash-injection point for the
    * atomicity spec: `crashAfterWrites = k` runs the state writes
    * SEQUENTIALLY, completes exactly `k` of the three appends, and dies
    * before the manifest flip (k = 3 crashes between the last append and
    * the flip). Production passes Int.MaxValue: concurrent writes, flip.
    */
  private[graft] def incrementalMinhashDedupImpl(batch: DataFrame,
      statePrefix: String, textCol: String, idCol: String, shingleK: Int,
      numHashes: Int, bands: Int, threshold: Double, seed: Long,
      buckets: Int, maxBucketSize: Int, foldTag: Option[String],
      crashAfterWrites: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    // an EMPTY tag would equal the placeholder an untagged fold records
    // in the manifest, making the replay-skip fire for a fold that never
    // used tags — a silently-skipped real fold
    require(foldTag.forall(_.nonEmpty), "foldTag must be non-empty")
    val spark = batch.sparkSession
    val bandsT = s"${statePrefix}_bands"
    val shinglesT = s"${statePrefix}_shingles"
    val countsT = s"${statePrefix}_bucket_counts"

    // single-writer enforcement FIRST: a concurrent fold from another
    // application must be refused before the sweep below can reclaim the
    // lock holder's in-flight (not-yet-committed) appends as orphans
    acquireStateWriter(spark, statePrefix)
    // restore the directory-equals-manifest invariant (reclaim any
    // crashed fold's unlisted files) BEFORE the first state read
    val hasState = syncStateToManifest(spark, statePrefix)
    // each fold phase re-arms the writer lease (and aborts loudly if a
    // contender claimed the lock after the lease lapsed mid-fold)
    heartbeatStateWriter(spark, statePrefix)
    // AFTER the sweep: its legacy-layout check must run before the marker
    // exists, or an upgrade's first fold would stamp the marker and then
    // reclaim the legacy tables as a "crashed first fold"
    ensureProtocolMarker(spark, statePrefix)
    val manifest = if (hasState) readStateManifest(spark, statePrefix)
      else None
    val committed: Map[String, Set[String]] =
      manifest.map(_.live).getOrElse(Map.empty)
    // tag-matched replay: the fold committed whole on a previous attempt
    // (crash landed after the manifest flip) — state is already folded;
    // replay only the pinned survivor verdict, exactly-once. The verdict
    // is the MANIFEST-NAMED loser dataset, never a shared mutable path: a
    // contract-violating caller replaying out of order fails loudly here
    // instead of silently reading some other fold's verdict.
    if (foldTag.isDefined && manifest.exists(_.tag == foldTag.get)) {
      val m = manifest.get
      val committedLosers =
        new org.apache.hadoop.fs.Path(loserVerdictRoot(spark, statePrefix),
          m.losers)
      val lfs = committedLosers
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (m.losers.isEmpty || !lfs.exists(committedLosers))
        throw new IllegalStateException(
          s"fold tag '${foldTag.get}' matches the committed manifest but " +
            s"its loser verdict '${m.losers}' is missing — the state was " +
            "externally corrupted, or the serial-folds contract was " +
            "violated (a later fold already committed over this tag)")
      val survivors = batch.join(
        spark.read.parquet(committedLosers.toString)
          .withColumnRenamed("id", idCol),
        Seq(idCol), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      survivors.count()
      releaseStateWriter(spark, statePrefix)
      return survivors
    }

    val (batchSigs, batchBanded) =
      bandBatch(batch, textCol, idCol, shingleK, numHashes, bands, seed)
    batchSigs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val losers = incrementalLoserIds(spark, batchSigs, batchBanded,
      statePrefix, threshold, maxBucketSize)

    // Pin the fold's loser verdict to a plain parquet PATH (not a catalog
    // table) before touching state. Two reasons, both real:
    //  - cache survival: the state appends below invalidate every cached
    //    plan that references the state tables (recacheByPlan), so a
    //    survivors frame built directly on `losers` would silently
    //    recompute the whole candidate join on the caller's first action
    //    AFTER the fold — against the grown state.
    //  - determinism: that post-append recompute would see the batch's own
    //    rows in history AND its delta in `_bucket_counts` (double-counted
    //    occupancy), which near the bucket cap could admit a different
    //    loser set than the one this fold committed to. The path read
    //    freezes the verdict.
    // The dataset is PER-ATTEMPT (unique name, committed by listing it in
    // the manifest flip): overwriting one shared path would let an
    // out-of-order replay read a different fold's verdict. Stranded
    // attempt datasets are swept at the next fold start.
    val loserName = s"f-${java.util.UUID.randomUUID()}"
    val loserPath = new org.apache.hadoop.fs.Path(
      loserVerdictRoot(spark, statePrefix), loserName).toString
    losers.coalesce(1).write.mode("overwrite").parquet(loserPath)
    heartbeatStateWriter(spark, statePrefix)

    // Ownership: the returned frame is handed to the caller PERSISTED and
    // already materialized (its plan — batch anti-join a tiny loser file —
    // has no catalog dependence, so the state appends below cannot evict
    // it); the caller unpersists once it has consumed it.
    val survivors = batch.join(
      spark.read.parquet(loserPath).withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    survivors.count()

    // fold the WHOLE batch (survivors and losers) into state: greedy
    // one-shot semantics compare against every smaller seen id. The
    // bucket-count delta is tiny and bounded by the batch — repartition
    // BEFORE aggregating (the clustering satisfies the groupBy, so one
    // shuffle covers both) and each fold appends exactly `buckets` files.
    val batchCounts = batchBanded.repartition(buckets, col("__bkey"))
      .groupBy("__bkey").agg(count(lit(1)).as("__bcnt"))
    // the three state tables are independent — run their write jobs
    // concurrently so a fold pays one write latency, not three (they all
    // read the persisted batchSigs, already materialized by the
    // survivor count above). The appends are NOT the commit: the fold
    // commits when the manifest flip below lands; files a crash strands
    // before that are unlisted and swept by the next fold.
    val mode = if (hasState) "append" else "error"
    val writes: Seq[(String, () => Unit)] = Seq(
      bandsT -> (() => batchBanded.write.mode(mode)
        .bucketBy(buckets, "__bkey")
        .format("parquet").saveAsTable(bandsT)),
      shinglesT -> (() => batchSigs.select(col("id"), col("__sh")).write
        .mode(mode)
        .bucketBy(buckets, "id").format("parquet").saveAsTable(shinglesT)),
      countsT -> (() => batchCounts.write.mode(mode)
        .bucketBy(buckets, "__bkey")
        .format("parquet").saveAsTable(countsT)))
    val preFiles: Map[String, Set[String]] =
      writes.map { case (t, _) => t -> listStatePartFiles(spark, t) }.toMap
    if (crashAfterWrites > writes.size) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence(writes.map(w => Future(w._2()))),
        Duration.Inf)
    } else {
      // injection path (specs only): sequential, die before the flip —
      // release both fold-owned persists (a real crash kills the JVM; an
      // injected one must not leak cached frames into the test session)
      writes.take(crashAfterWrites).foreach(_._2())
      batchSigs.unpersist()
      survivors.unpersist()
      throw new IllegalStateException(
        s"injected crash after $crashAfterWrites state write(s)")
    }
    // THE commit: one atomic manifest flip publishing all three appends
    // (and naming this attempt's loser dataset as the fold's verdict).
    // The pre-flip heartbeat doubles as the lost-lock tripwire: a fold
    // whose lease lapsed during the append jobs must NOT flip a manifest
    // over a new holder's state
    heartbeatStateWriter(spark, statePrefix)
    val folded = writes.map { case (t, _) =>
      t -> (committed.getOrElse(t, Set.empty) ++
        (listStatePartFiles(spark, t) -- preFiles(t)))
    }.toMap
    writeStateManifest(spark, statePrefix,
      StateManifest(foldTag.getOrElse(""), loserName, folded,
        manifest.map(_.retired).getOrElse(Map.empty)))
    // amortized upkeep: once the delta generations pile up, fold them
    // back to one row per key so the guard's read stays bounded by the
    // live bucket-key universe, not by fold count
    if (hasState && stateFileCount(spark, countsT) > buckets * 8) {
      heartbeatStateWriter(spark, statePrefix)
      compactBucketCounts(spark, statePrefix, buckets)
    }
    batchSigs.unpersist()
    releaseStateWriter(spark, statePrefix)
    survivors
  }

  /** Shingle+signature frame and banded (`__bkey`, id) stream for one
    * incoming batch — shared by [[incrementalMinhashDedup]] and the
    * plan-pin specs (which need the candidate plan WITHOUT running the
    * fold's actions). */
  private[graft] def bandBatch(batch: DataFrame, textCol: String,
      idCol: String, shingleK: Int, numHashes: Int, bands: Int,
      seed: Long): (DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / bands
    // shinglesOf, not shingleHashes: banding must accept the same
    // pre-tokenized / pre-hashed inputs its exact-verify tail does
    val batchSigs = batch
      .select(col(idCol).as("id"),
        shinglesOf(batch, textCol, shingleK).as("__sh"))
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes, seed))
    val batchBanded = batchSigs
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        ).as(Seq("__band", "__bandhash")))
      .select(xxhash64(col("__band"), col("__bandhash")).as("__bkey"),
        col("id"))
    (batchSigs, batchBanded)
  }

  /** Loser ids (batch docs with a smaller-id near-duplicate in history or
    * in the batch) for one fold, as a lazy single-column `id` frame. The
    * `_bands` history is referenced by EXACTLY ONE scan — the candidate
    * join — because the hot-bucket guard sizes buckets against the
    * incrementally-maintained `_bucket_counts` table instead of recounting
    * band history (the r9 formulation's second full-history scan). */
  private[graft] def incrementalLoserIds(spark: SparkSession,
      batchSigs: DataFrame, batchBanded: DataFrame, statePrefix: String,
      threshold: Double, maxBucketSize: Int): DataFrame = {
    val bandsT = s"${statePrefix}_bands"
    val shinglesT = s"${statePrefix}_shingles"
    val countsT = s"${statePrefix}_bucket_counts"
    val hasState = spark.catalog.tableExists(bandsT)

    // hot-bucket guard, same contract as minhashCandidates' maxBucketSize:
    // buckets whose TOTAL occupancy (history + batch) exceeds the cap are
    // excluded from candidate generation before either join can go b².
    // Only BATCH keys need sizing (a bucket the batch never touches
    // generates no pairs this fold), and history occupancy comes from the
    // 16-byte/row `_bucket_counts` table — summed bucket-locally (the
    // table is bucketed on `__bkey`, so the groupBy needs no exchange)
    // over the delta rows each fold appends. Equality with the one-shot
    // greedy dedup holds whenever no bucket exceeds the cap over the FULL
    // corpus (the sane-corpus case — boilerplate mega-buckets are banned
    // upstream in both modes).
    val batchCounts = batchBanded.groupBy("__bkey")
      .agg(count(lit(1)).as("__bcnt"))
    val okBatchKeys =
      if (!hasState) batchCounts
        .filter(col("__bcnt") <= maxBucketSize).select("__bkey")
      else {
        val histCounts = spark.table(countsT).groupBy("__bkey")
          .agg(sum("__bcnt").as("__hcnt"))
        batchCounts.join(histCounts, Seq("__bkey"), "left")
          .filter(coalesce(col("__hcnt"), lit(0L)) + col("__bcnt")
            <= maxBucketSize)
          .select("__bkey")
      }
    val batchB = batchBanded.join(okBatchKeys, Seq("__bkey"), "left_semi")
    // candidate ids: smaller-id partner exists in history or in the batch.
    // The history side needs NO ok-bucket filter of its own: the inner
    // join with the already-guarded batchB restricts it to ok batch keys.
    val histPairs =
      if (!hasState) batchBanded.limit(0)
        .select(col("id").as("id_a"), col("id").as("id_b")).limit(0)
      else spark.table(bandsT)
        .join(batchB.withColumnRenamed("id", "id_b"), Seq("__bkey"))
        .filter(col("id") < col("id_b"))
        .select(col("id").as("id_a"), col("id_b"))
    val selfPairs = batchB
      .join(batchB.withColumnRenamed("id", "id_b"), Seq("__bkey"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
    val pairIds = histPairs.unionByName(selfPairs)
      .dropDuplicates("id_a", "id_b")

    // exact verify: batch side shingles from the persisted batch, history
    // side from the bucketed shingle table — joined SEPARATELY, because a
    // history∪batch union erases the table's id-bucketing and re-shuffles
    // the stored shingle ARRAYS on every dup-heavy fold (exactly the
    // exchange the bucketed layout pre-paid). A pair's id_a is either
    // historical or in-batch (ids are unique across batches), so the two
    // joins partition the pair list and their union is exact. The pair
    // list feeding both branches ends in a dropDuplicates exchange, which
    // ReuseExchange dedups — the _bands history stays a single scan (the
    // x42 plan pin holds).
    val shB = batchSigs.select(col("id").as("id_b"), col("__sh").as("__sh_b"))
    val shABatch = batchSigs
      .select(col("id").as("id_a"), col("__sh").as("__sh_a"))
    val withShA =
      if (!hasState) pairIds.join(shABatch, Seq("id_a"))
      else {
        val shAHist = spark.table(shinglesT)
          .select(col("id").as("id_a"), col("__sh").as("__sh_a"))
        pairIds.join(shAHist, Seq("id_a"))
          .unionByName(pairIds.join(shABatch, Seq("id_a")))
      }
    val inter = size(array_intersect(col("__sh_a"), col("__sh_b")))
    val union = size(col("__sh_a")) + size(col("__sh_b")) - inter
    withShA
      .join(shB, Seq("id_b"))
      .filter(when(union > 0, inter.cast("double") / union)
        .otherwise(lit(0.0)) >= threshold)
      .select(col("id_b").as("id"))
      .distinct()
  }

  /** Compact the delta-appended `_bucket_counts` state back to one row per
    * `__bkey`. Each fold appends O(batch) delta rows; compaction keeps the
    * guard's read bounded by the live bucket-key universe instead of the
    * number of folds since the table was created. Called automatically by
    * [[incrementalMinhashDedup]] once the table exceeds 8 appended file
    * generations.
    *
    * Crash-safe under the same manifest protocol as the fold itself: the
    * summed rows APPEND into the same table (no drop, no catalog rename —
    * the old drop+RENAME left the table MISSING across a crash between
    * the two) and the manifest flips to list the new files as live. The
    * superseded delta files are NOT deleted here: they flip to RETIRED —
    * still allowed on disk, no longer state content — and are reclaimed
    * by the NEXT fold's sweep, one generation later. The immediate
    * post-flip delete (pre-r17) gave a concurrent reader holding the
    * pre-compaction file list no retention window at all: its scan could
    * hit FileNotFound mid-flight. Deferring by one fold generation means
    * a reader that planned its scan before the flip has the entire next
    * inter-fold interval to finish.
    */
  private[graft] def compactBucketCounts(spark: SparkSession,
      statePrefix: String, buckets: Int): Unit = {
    val countsT = s"${statePrefix}_bucket_counts"
    val m = readStateManifest(spark, statePrefix)
      .getOrElse(throw new IllegalStateException(
        s"compactBucketCounts($statePrefix): no committed state manifest"))
    val before = listStatePartFiles(spark, countsT)
    spark.table(countsT).groupBy("__bkey")
      .agg(sum("__bcnt").as("__bcnt"))
      .repartition(buckets, col("__bkey"))
      .write.mode("append").bucketBy(buckets, "__bkey")
      .format("parquet").saveAsTable(countsT)
    val fresh = listStatePartFiles(spark, countsT) -- before
    writeStateManifest(spark, statePrefix,
      m.copy(live = m.live.updated(countsT, fresh),
        retired = m.retired.updated(countsT,
          m.retired.getOrElse(countsT, Set.empty) ++ before)))
    // the retired generation is NOT deleted: reclaimed at the next
    // fold's sweep — the concurrent-reader retention window. But the
    // catalog must re-list the directory so THIS session's reads see
    // the compacted layout.
    spark.catalog.refreshTable(countsT)
  }

  /** Path of the atomically-flipped state manifest — THE commit record
    * of the three-table incremental-dedup state. Format: line 1 is
    * `tag<TAB><foldTag>`, then one `<table><TAB><fileName>` line per
    * committed data file.
    */
  private def stateManifestPath(spark: SparkSession,
      statePrefix: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${statePrefix}_state_manifest")

  /** Root DIRECTORY holding one loser-verdict parquet dataset per fold
    * attempt (`f-<uuid>`). The manifest records WHICH one is the
    * committed fold's verdict; unreferenced attempt dirs are swept at
    * fold start. A single shared overwritten path (the pre-r17 layout)
    * was correct only under the serial-folds contract — a racing or
    * out-of-order replay could silently read a DIFFERENT fold's verdict.
    */
  private def loserVerdictRoot(spark: SparkSession,
      statePrefix: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${statePrefix}_losers")

  /** The committed state of one incremental-dedup prefix, as recorded by
    * the atomically-flipped manifest: the committed fold tag, the name of
    * that fold's loser-verdict dataset (under [[loserVerdictRoot]]; empty
    * for adopted legacy state, whose last fold predates the protocol),
    * the LIVE data files per table, and the RETIRED files — superseded by
    * a compaction but kept on disk for one fold generation so a reader
    * holding the pre-compaction file list never hits FileNotFound
    * mid-scan. Readers must use live ∪ retired as "allowed on disk";
    * only live files are state content.
    */
  private[graft] case class StateManifest(tag: String, losers: String,
      live: Map[String, Set[String]], retired: Map[String, Set[String]])

  private[graft] def readStateManifest(spark: SparkSession,
      statePrefix: String): Option[StateManifest] = {
    val p = stateManifestPath(spark, statePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      val tag = lines.headOption match {
        case Some(h) if h.startsWith("tag\t") => h.drop(4)
        case _ => throw new IllegalStateException(
          s"corrupt state manifest $p: missing tag header")
      }
      val losers = lines.lift(1) match {
        case Some(h) if h.startsWith("losers\t") => h.drop(7)
        case _ => throw new IllegalStateException(
          s"corrupt state manifest $p: missing losers header")
      }
      def group(kind: String): Map[String, Set[String]] =
        lines.drop(2).filter(_.nonEmpty).flatMap { l =>
          l.split("\t") match {
            case Array(`kind`, t, f) => Some((t, f))
            case Array(_, _, _) => None
            case _ => throw new IllegalStateException(
              s"corrupt state manifest $p: bad line '$l'")
          }
        }.groupBy(_._1).map { case (t, fs2) => t -> fs2.map(_._2).toSet }
      Some(StateManifest(tag, losers, group("live"), group("retired")))
    }
  }

  /** Atomic manifest flip: write a temp file, rename over the live path
    * with OVERWRITE — readers see either the old commit or the new one,
    * never a partial file (the [[graft.sources.VersionedTable]] pointer
    * protocol).
    */
  private def writeStateManifest(spark: SparkSession, statePrefix: String,
      manifest: StateManifest): Unit = {
    require(!manifest.tag.contains("\n") && !manifest.tag.contains("\t"),
      s"foldTag must not contain tab/newline: '${manifest.tag}'")
    val p = stateManifestPath(spark, statePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    def lines(kind: String, tables: Map[String, Set[String]]): Seq[String] =
      tables.toSeq.sortBy(_._1).flatMap {
        case (t, files) => files.toSeq.sorted.map(f => s"$kind\t$t\t$f")
      }
    val body = (Seq(s"tag\t${manifest.tag}", s"losers\t${manifest.losers}") ++
      lines("live", manifest.live) ++ lines("retired", manifest.retired))
      .mkString("\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Current `part-*` data files backing a managed state table (empty
    * set if the table does not exist). */
  private def listStatePartFiles(spark: SparkSession,
      table: String): Set[String] =
    stateTableLocation(spark, table).map { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) Set.empty[String]
      else fs.listStatus(loc).iterator
        .map(_.getPath.getName).filter(_.startsWith("part-")).toSet
    }.getOrElse(Set.empty)

  /** Restore `directory contents == committed manifest` for every state
    * table, reclaiming any crashed fold's stranded (unlisted) files —
    * called before the first state read of every fold, so a torn
    * three-table state is never observable. Returns whether committed
    * state exists.
    *
    * No manifest + existing tables is TWO states, disambiguated by the
    * protocol marker ([[stateProtocolMarkerPath]], written before any
    * fold ever appends): marker present = a FIRST fold crashed before its
    * first flip — definitively uncommitted, the tables are reclaimed
    * whole; marker ABSENT = a pre-manifest legacy layout whose tables ARE
    * committed history — reclaiming them would silently destroy the
    * accumulated dedup corpus and re-admit every previously-seen
    * duplicate, so the sweep fails loudly and directs the operator to
    * [[adoptIncrementalDedupState]] (migrate) or
    * [[dropIncrementalDedupState]] (restart).
    *
    * A manifest-listed LIVE file missing from disk is external corruption
    * and fails loudly; a RETIRED file missing is fine (a prior reclaim
    * crashed mid-delete). After the orphan sweep, retired files — kept on
    * disk through the previous fold generation as the concurrent-reader
    * retention window — are reclaimed: the manifest flips to drop the
    * retired entries FIRST, then their files are deleted (a crash between
    * the two leaves unlisted files for the next sweep). Loser-verdict
    * attempt datasets not named by the manifest are swept too.
    */
  private[graft] def syncStateToManifest(spark: SparkSession,
      statePrefix: String): Boolean = {
    val tables = Seq(s"${statePrefix}_bands", s"${statePrefix}_shingles",
      s"${statePrefix}_bucket_counts")
    val hconf = spark.sparkContext.hadoopConfiguration
    readStateManifest(spark, statePrefix) match {
      case None =>
        val existing = tables.filter(spark.catalog.tableExists)
        if (existing.nonEmpty) {
          val marker = stateProtocolMarkerPath(spark, statePrefix)
          val mfs = marker.getFileSystem(hconf)
          if (!mfs.exists(marker)) throw new IllegalStateException(
            s"incremental-dedup state tables ${existing.mkString(", ")} " +
              "exist without a commit manifest or protocol marker: this " +
              "is a PRE-manifest legacy layout whose tables are committed " +
              "dedup history. Refusing to reclaim them (that would " +
              "silently re-admit every previously-seen duplicate). Call " +
              s"Dedup.adoptIncrementalDedupState(spark, \"$statePrefix\") " +
              "to migrate the existing state under the manifest protocol, " +
              s"or Dedup.dropIncrementalDedupState(spark, \"$statePrefix\")" +
              " to discard it deliberately")
          existing.foreach(dropStateTable(spark, _))
        }
        // no committed verdict exists either — sweep stranded attempts
        val lroot = loserVerdictRoot(spark, statePrefix)
        val lfs = lroot.getFileSystem(hconf)
        if (lfs.exists(lroot)) lfs.delete(lroot, true)
        false
      case Some(m) =>
        tables.foreach { t =>
          require(spark.catalog.tableExists(t),
            s"state table $t is listed in the committed manifest but " +
              "missing from the catalog. Either the state was externally " +
              "corrupted, or this session's catalog does not persist " +
              "across JVM restarts (in-memory catalog): resuming " +
              "incremental-dedup state in a NEW process requires a " +
              "persistent metastore, the standard deployment for " +
              "long-lived bucketed state")
          val live = m.live.getOrElse(t, Set.empty)
          val retired = m.retired.getOrElse(t, Set.empty)
          val have = listStatePartFiles(spark, t)
          val lost = live -- have
          require(lost.isEmpty,
            s"state table $t lost committed data files ${lost.mkString(",")}" +
              " — state externally corrupted")
          val orphans = have -- live -- retired
          if (orphans.nonEmpty) {
            stateTableLocation(spark, t).foreach { loc =>
              val fs = loc.getFileSystem(hconf)
              orphans.foreach(n =>
                fs.delete(new org.apache.hadoop.fs.Path(loc, n), false))
            }
            spark.catalog.refreshTable(t)
          }
        }
        // end of the one-generation retention window: drop the retired
        // entries from the manifest (atomic flip), THEN delete the files
        if (m.retired.values.exists(_.nonEmpty)) {
          writeStateManifest(spark, statePrefix,
            m.copy(retired = Map.empty))
          m.retired.foreach { case (t, files) =>
            stateTableLocation(spark, t).foreach { loc =>
              val fs = loc.getFileSystem(hconf)
              files.foreach(n =>
                fs.delete(new org.apache.hadoop.fs.Path(loc, n), false))
            }
            if (files.nonEmpty) spark.catalog.refreshTable(t)
          }
        }
        // sweep loser-verdict datasets of uncommitted fold attempts
        val lroot = loserVerdictRoot(spark, statePrefix)
        val lfs = lroot.getFileSystem(hconf)
        if (lfs.exists(lroot))
          lfs.listStatus(lroot).map(_.getPath)
            .filter(_.getName != m.losers)
            .foreach(lfs.delete(_, true))
        true
    }
  }

  /** Path of the protocol marker: created (once, before any append) by
    * the first fold that runs on a prefix under the manifest protocol,
    * removed only by [[dropIncrementalDedupState]]. Its presence is what
    * lets the sweep distinguish "a first fold crashed before its first
    * manifest flip" (tables uncommitted — reclaim) from "pre-manifest
    * legacy state" (tables ARE the committed history — refuse loudly).
    */
  private def stateProtocolMarkerPath(spark: SparkSession,
      statePrefix: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${statePrefix}_state_protocol")

  /** Root directory of the single-writer token and its heartbeat
    * sidecars. Defaults to the warehouse; override with
    * `spark.graft.incrementalDedup.lockRoot` when the warehouse lives on
    * a store whose create/rename are not atomic (S3-class object stores
    * rename by copy+delete): the lock's create-no-overwrite acquire and
    * rename-as-CAS takeover are only as exclusive as the store under
    * them, so point the lock at HDFS-class storage even when the state
    * tables themselves stay on the object store.
    */
  private def stateLockRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.incrementalDedup.lockRoot")
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))

  /** Path of the single-writer token — see [[acquireStateWriter]]. */
  private def stateWriterTokenPath(spark: SparkSession,
      statePrefix: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(stateLockRoot(spark),
      s"${statePrefix}_state_writer")

  /** URI schemes whose stores rename by copy+delete and create by
    * check-then-write — neither the lock's create-no-overwrite acquire
    * nor its rename-as-CAS takeover is exclusive there, so two writers
    * racing on such a store can BOTH believe they hold the lock
    * (split-brain: exactly the torn state the token exists to prevent).
    * Hadoop 3.4 exposes no atomic-rename path capability to probe, so
    * the guard is by scheme, the same approach Delta Lake's LogStore
    * takes for its S3 commit problem. The lock is tiny and unrelated to
    * where the state TABLES live — point
    * `spark.graft.incrementalDedup.lockRoot` at any HDFS-class path.
    */
  private val CopyRenameSchemes = Set(
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss",
    "cos", "swift")

  /** Refuse a writer lock rooted on a copy-rename object store (see
    * [[CopyRenameSchemes]]) — loudly, at acquire time, instead of
    * letting a non-exclusive lock split-brain silently under a race.
    * `spark.graft.incrementalDedup.allowNonAtomicLockStore=true` is the
    * documented escape hatch for deployments whose writers are
    * serialized by construction (one scheduler, one fold at a time);
    * it logs the residual risk rather than hiding it.
    */
  private def refuseNonAtomicLockStore(spark: SparkSession,
      p: org.apache.hadoop.fs.Path): Unit = {
    val scheme = Option(p.toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
    if (!CopyRenameSchemes.contains(scheme)) return
    val allowKey = "spark.graft.incrementalDedup.allowNonAtomicLockStore"
    if (spark.conf.getOption(allowKey).contains("true")) {
      System.err.println(
        s"[graft] WARNING: incremental-dedup writer lock '$p' lives on " +
          s"'$scheme://', whose rename is copy+delete — the lock is NOT " +
          s"exclusive under concurrent writers ($allowKey=true: caller " +
          "asserts folds are externally serialized)")
      return
    }
    throw new IllegalStateException(
      s"incremental-dedup writer lock would live on '$scheme://' " +
        s"('$p'), whose rename is a non-atomic copy+delete and whose " +
        "create is check-then-write: two racing writers could BOTH " +
        "acquire it (split-brain), which is the exact torn-state " +
        "hazard the lock exists to prevent. Set " +
        "spark.graft.incrementalDedup.lockRoot to an HDFS-class path " +
        "(atomic rename; the lock is tiny — the state tables may stay " +
        "where they are), or set " +
        "spark.graft.incrementalDedup.allowNonAtomicLockStore=true " +
        "if folds on this prefix are serialized by construction")
  }

  /** Lease duration of the writer token (seconds). The holder records a
    * heartbeat at every fold phase ([[heartbeatStateWriter]] — a fresh
    * sidecar file next to the token, so the refresh needs only
    * create+list+delete, never `setTimes`);
    * a contender may take the lock over only once the token has gone
    * [[WriterLeaseMissesForTakeover]] full leases without a refresh —
    * i.e. the holder is not merely slow inside one phase, it has missed
    * the heartbeat several times over. SIZE the lease ABOVE the longest
    * single fold phase (the state-append jobs at the deployment's batch
    * size): a too-short lease lets a live-but-busy writer be usurped,
    * which is exactly the torn-state hazard the token exists to prevent.
    */
  private def writerLeaseSec(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.incrementalDedup.writerLeaseSec")
      .map(_.toLong).getOrElse(600L)

  /** Missed-lease multiplier before a stranded token is claimable. */
  private val WriterLeaseMissesForTakeover = 3L

  /** Name prefix of the heartbeat sidecar files of a writer token. */
  private def writerHbPrefix(p: org.apache.hadoop.fs.Path): String =
    p.getName + ".hb-"

  /** Holder application recorded in a token or sidecar file; "" when the
    * file is unreadable (vanished under us, or a torn write). */
  private def readWriterHolder(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        .split("\t").headOption.getOrElse("")
      finally in.close()
    } catch { case _: java.io.IOException => "" }

  /** Newest heartbeat instant of the token's CURRENT holder: the token's
    * own mtime (recorded at create on every store) or any heartbeat
    * sidecar naming the same holder. Sidecars stranded by a PREVIOUS
    * holder name a different application and are inert — they can never
    * keep a dead writer's lease alive past its own last beat. Returns -1
    * when the token itself vanished (released or claimed under us).
    */
  private def lastWriterHeartbeatMs(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, holder: String): Long = {
    val tokenMtime =
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => return -1L }
    val sidecars =
      try fs.listStatus(p.getParent)
        .filter(_.getPath.getName.startsWith(writerHbPrefix(p)))
      catch { case _: java.io.IOException =>
        Array.empty[org.apache.hadoop.fs.FileStatus]
      }
    (tokenMtime +: sidecars.toSeq
      .filter(st => readWriterHolder(fs, st.getPath) == holder)
      .map(_.getModificationTime)).max
  }

  /** Reclaim every heartbeat sidecar of a token (takeover, release,
    * drop). Best-effort: a leaked sidecar is liveness litter, not a
    * safety hazard — [[lastWriterHeartbeatMs]] matches on holder. */
  private def deleteWriterSidecars(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit =
    try fs.listStatus(p.getParent)
      .filter(_.getPath.getName.startsWith(writerHbPrefix(p)))
      .foreach(st => fs.delete(st.getPath, false))
    catch { case _: java.io.IOException => }

  /** Enforce the protocol's single-writer contract: atomically create a
    * writer token naming this Spark application before the fold touches
    * anything. A second concurrent writer from a DIFFERENT application
    * finds the token and is refused LOUDLY — without this, the intruder's
    * fold-start sweep would silently reclaim the first writer's in-flight
    * (unlisted) appends as crash orphans. A token from the SAME
    * application is a previous attempt of this serial caller (the fold
    * crashed or threw after acquiring), so the retry proceeds.
    *
    * LIVENESS: a token stranded by a crashed application no longer wedges
    * the prefix until a human intervenes. The holder heartbeats at each
    * fold phase (a fresh sidecar file — [[heartbeatStateWriter]]); a
    * token whose newest holder heartbeat is older than
    * [[WriterLeaseMissesForTakeover]] x the lease is evidence the holder
    * missed every heartbeat for several leases running, and a contender
    * may then claim it — LOUDLY logged, via an atomic rename to a
    * contender-unique tombstone so exactly one of several simultaneous
    * claimants wins (rename-as-CAS; a plain delete+create would let a
    * second claimant delete the FIRST claimant's fresh token).
    * [[breakIncrementalDedupWriterLock]] remains the manual override for
    * operators who know the holder is dead and cannot wait out the lease.
    */
  private[graft] def acquireStateWriter(spark: SparkSession,
      statePrefix: String): Unit = {
    val p = stateWriterTokenPath(spark, statePrefix)
    refuseNonAtomicLockStore(spark, p)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val me = spark.sparkContext.applicationId
    def holder(): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        .split("\t").headOption.getOrElse("")
      finally in.close()
    }
    def refuse(h: String): Nothing = throw new IllegalStateException(
      s"incremental-dedup state '$statePrefix' is locked by writer " +
        s"application '$h' (this is '$me'). Folds on one prefix are " +
        "single-writer: a concurrent fold's sweep would reclaim the " +
        "lock holder's in-flight state appends. The lock expires " +
        s"${WriterLeaseMissesForTakeover}x the lease " +
        s"(spark.graft.incrementalDedup.writerLeaseSec = " +
        s"${writerLeaseSec(spark)}s) after the holder's last heartbeat; " +
        "if the holding application is known dead and the wait is " +
        "unacceptable, call " +
        s"Dedup.breakIncrementalDedupWriterLock(spark, \"$statePrefix\") " +
        "and retry")
    def create(): Boolean =
      try {
        val out = fs.create(p, false) // no overwrite: loses any race
        try out.write(s"$me\t${java.util.UUID.randomUUID()}"
          .getBytes("UTF-8"))
        finally out.close()
        true
      } catch {
        case _: java.io.IOException if fs.exists(p) => false
      }
    var attempts = 0
    while (attempts < 3) {
      attempts += 1
      if (!fs.exists(p)) {
        if (create()) return
        // lost the create race: loop re-reads the new holder
      } else {
        val h = try holder() catch {
          // token vanished between exists() and open(): released/claimed
          // under us — retry the loop from scratch
          case _: java.io.FileNotFoundException => null
        }
        if (h == null) ()
        else if (h == me) {
          // our own previous attempt — re-arm the lease for this fold
          heartbeatStateWriter(spark, statePrefix)
          return
        } else {
          val lastBeat = lastWriterHeartbeatMs(fs, p, h)
          val ageMs =
            if (lastBeat < 0) -1L
            else System.currentTimeMillis() - lastBeat
          val expiryMs =
            writerLeaseSec(spark) * WriterLeaseMissesForTakeover * 1000L
          if (ageMs < 0) () // vanished: loop retries
          else if (ageMs <= expiryMs) refuse(h)
          else {
            // expired: claim via rename-as-CAS (exactly one claimant's
            // rename of THIS path can succeed; the loser loops and sees
            // the winner's fresh token)
            val tomb = new org.apache.hadoop.fs.Path(p.getParent,
              s"${p.getName}.expired-${java.util.UUID.randomUUID()}")
            if (fs.rename(p, tomb)) {
              fs.delete(tomb, false)
              deleteWriterSidecars(fs, p) // the dead holder's last beats
              System.err.println(
                s"[graft] TAKING OVER incremental-dedup writer lock " +
                  s"'$statePrefix' from application '$h': token heartbeat " +
                  s"is ${ageMs / 1000}s old > ${expiryMs / 1000}s " +
                  s"(${WriterLeaseMissesForTakeover}x lease of " +
                  s"${writerLeaseSec(spark)}s) — holder presumed dead. " +
                  s"New holder: '$me'")
              if (create()) return
            }
          }
        }
      }
    }
    // three full races lost back-to-back: livelock among claimants —
    // surface it rather than spin
    throw new IllegalStateException(
      s"could not acquire incremental-dedup writer lock '$statePrefix' " +
        s"after $attempts attempts — lost every create/claim race; retry")
  }

  /** Refresh the writer lease: called at each fold phase by the holder.
    * Verifies the token still names THIS application first — if the
    * lease lapsed and a contender claimed the lock mid-fold, continuing
    * to write would produce exactly the torn state the protocol guards
    * against, so the fold must die loudly instead.
    *
    * PORTABILITY: the refresh is a CONTENT heartbeat — create a fresh
    * sidecar file (`<token>.hb-<uuid>`, content = this holder) and
    * reclaim the superseded ones — never `fs.setTimes`, which several
    * object-store filesystems refuse (UnsupportedOperationException OR a
    * plain IOException, store-dependent) or silently no-op; either way a
    * mtime-refresh lease could not beat there and a fold outliving the
    * takeover window would be usurped while alive. The sidecar route
    * needs only create+list+delete with create-time mtimes, which every
    * store the protocol already requires provides. A sidecar write
    * failure is non-fatal (liveness-only, warned): safety rests on the
    * holder check above, which aborts a usurped fold at its next
    * heartbeat BEFORE it can flip a manifest over the new holder's
    * state.
    */
  private[graft] def heartbeatStateWriter(spark: SparkSession,
      statePrefix: String): Unit = {
    val p = stateWriterTokenPath(spark, statePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val me = spark.sparkContext.applicationId
    val h = readWriterHolder(fs, p)
    if (h != me) throw new IllegalStateException(
      s"incremental-dedup writer lock '$statePrefix' was lost mid-fold " +
        s"(holder is now '${if (h.isEmpty) "<none>" else h}', this is " +
        s"'$me'): the lease expired and a contender took over, or the " +
        "lock was broken manually. Aborting this fold — its uncommitted " +
        "appends will be swept by the new holder")
    val hb = new org.apache.hadoop.fs.Path(p.getParent,
      s"${writerHbPrefix(p)}${java.util.UUID.randomUUID()}")
    try {
      val out = fs.create(hb, false) // unique name: cannot collide
      try out.write(me.getBytes("UTF-8")) finally out.close()
      // reclaim the superseded beats AFTER the fresh one exists, so a
      // contender listing mid-heartbeat always sees at least one. Only
      // OUR OWN superseded beats: a usurped-but-not-yet-aware holder
      // that slipped past the holder check above (TOCTOU window) must
      // not delete the NEW live holder's fresh sidecars — that would
      // regress the new holder's recorded lease to the token's create
      // time and invite a premature takeover of a live writer.
      // Foreign-holder sidecars are inert (lastWriterHeartbeatMs matches
      // on holder) and are swept at takeover/release.
      fs.listStatus(p.getParent)
        .filter(st => st.getPath.getName.startsWith(writerHbPrefix(p)) &&
          st.getPath.getName != hb.getName &&
          readWriterHolder(fs, st.getPath) == me)
        .foreach(st => fs.delete(st.getPath, false))
    } catch {
      case e: java.io.IOException =>
        System.err.println(
          s"[graft] WARNING: writer-lease heartbeat on '$statePrefix' " +
            s"could not write its sidecar (${e.getMessage}) — liveness " +
            "only: the lease ages toward takeover, and a usurped holder " +
            "still aborts safely at its next heartbeat's holder check")
    }
  }

  private def releaseStateWriter(spark: SparkSession,
      statePrefix: String): Unit = {
    val p = stateWriterTokenPath(spark, statePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    deleteWriterSidecars(fs, p)
  }

  /** Operator override for a writer token stranded by a dead application:
    * deletes the lock so a new process can fold. Only safe once the
    * holding driver is known dead — see [[acquireStateWriter]].
    */
  def breakIncrementalDedupWriterLock(spark: SparkSession,
      statePrefix: String): Unit =
    releaseStateWriter(spark, statePrefix)

  /** Migrate a PRE-manifest legacy state (three tables, no manifest — the
    * layout written before the atomic-commit protocol) under the
    * protocol: adopts the tables' current data files as the initial
    * committed manifest, preserving the accumulated dedup history that
    * the sweep would otherwise refuse to touch. Requires all three tables
    * present and no manifest; the adopted commit is untagged (no
    * replay-skip can fire against it) and has no loser verdict.
    */
  def adoptIncrementalDedupState(spark: SparkSession,
      statePrefix: String): Unit = {
    require(readStateManifest(spark, statePrefix).isEmpty,
      s"state '$statePrefix' already has a committed manifest")
    val tables = Seq(s"${statePrefix}_bands", s"${statePrefix}_shingles",
      s"${statePrefix}_bucket_counts")
    val missing = tables.filterNot(spark.catalog.tableExists)
    require(missing.isEmpty,
      s"cannot adopt state '$statePrefix': tables ${missing.mkString(", ")}" +
        " missing — a partial legacy layout is not a committed state; " +
        "drop and rebuild instead")
    val live = tables.map(t => t -> listStatePartFiles(spark, t)).toMap
    ensureProtocolMarker(spark, statePrefix)
    writeStateManifest(spark, statePrefix,
      StateManifest(tag = "", losers = "", live = live,
        retired = Map.empty))
  }

  private def ensureProtocolMarker(spark: SparkSession,
      statePrefix: String): Unit = {
    val p = stateProtocolMarkerPath(spark, statePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fs.create(p, true).close()
  }

  /** Number of data files currently backing a managed state table — the
    * cheap driver-side proxy for "appended fold generations" that triggers
    * [[compactBucketCounts]]. */
  /** The CATALOG's location for a managed state table — never a
    * hand-built `warehouse/<name>` path, which is wrong for any
    * non-default current database (`warehouse/<db>.db/<name>`) and for
    * mixed-case prefixes (the catalog lowercases identifiers). The old
    * guess made `stateFileCount` return 0 forever in those setups, so
    * compaction never triggered and the counts-delta table grew
    * unboundedly with fold count.
    */
  private def stateTableLocation(spark: SparkSession,
      table: String): Option[org.apache.hadoop.fs.Path] =
    try {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
      Some(new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(id).location))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def stateFileCount(spark: SparkSession, table: String): Int =
    stateTableLocation(spark, table).map { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) 0
      else fs.listStatus(loc).count(_.getPath.getName.startsWith("part-"))
    }.getOrElse(0)

  private def dropStateTable(spark: SparkSession, table: String): Unit = {
    // resolve the location BEFORE the drop (metadata gone after); DROP
    // TABLE already reclaims managed data — the fs sweep is the backstop
    // for leftovers of a crashed earlier drop
    val loc = stateTableLocation(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    loc.foreach { l =>
      val fs = l.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(l)) fs.delete(l, true)
    }
  }

  /** Drop the state tables of [[incrementalMinhashDedup]] (idempotent).
    * The MANIFEST goes first: a drop that crashes midway then leaves
    * manifest-less tables, which the next fold's sweep reclaims as
    * uncommitted — dropping tables first would strand a manifest whose
    * listed tables are gone, the loud "externally corrupted" failure.
    * The PROTOCOL MARKER goes last: a drop that crashed after removing
    * the marker but before the tables would otherwise leave manifest-less
    * marker-less tables — the legacy-layout signature, wedging the next
    * fold on a loud migration error for state that was being discarded.
    */
  def dropIncrementalDedupState(spark: SparkSession,
      statePrefix: String): Unit = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(s"${statePrefix}_state_manifest", s"${statePrefix}_losers")
      .foreach { n =>
        val p = new org.apache.hadoop.fs.Path(warehouse, n)
        if (fs.exists(p)) fs.delete(p, true)
      }
    // the token may live on a different store (lockRoot): resolve its
    // own filesystem rather than assuming the warehouse's
    locally {
      val tok = stateWriterTokenPath(spark, statePrefix)
      val tfs = tok.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (tfs.exists(tok)) tfs.delete(tok, false)
      deleteWriterSidecars(tfs, tok)
    }
    Seq(s"${statePrefix}_bands", s"${statePrefix}_shingles",
      s"${statePrefix}_bucket_counts", s"${statePrefix}_bucket_counts_compact")
      .foreach(dropStateTable(spark, _))
    val marker = stateProtocolMarkerPath(spark, statePrefix)
    if (fs.exists(marker)) fs.delete(marker, false)
  }

  /** Snapshot-consistent read of the `_bucket_counts` occupancy (one row
    * per band-bucket key, summed): MANIFEST-LIVE files only. Inside a
    * compaction retention window — from a compaction's manifest flip
    * until the next fold's sweep — the table directory deliberately holds
    * both the compacted generation (live) and the superseded deltas
    * (retired, kept so a scan planned before the flip cannot hit
    * FileNotFound mid-flight), and a raw `spark.table` read there counts
    * every bucket twice. External occupancy consumers go through this.
    * (The fold's own reads always run after the sweep, when directory ==
    * live, so they read the bucketed table directly, exchange-free.)
    */
  def readBucketCounts(spark: SparkSession, statePrefix: String): DataFrame = {
    val countsT = s"${statePrefix}_bucket_counts"
    val m = readStateManifest(spark, statePrefix)
      .getOrElse(throw new IllegalStateException(
        s"readBucketCounts($statePrefix): no committed state manifest"))
    val loc = stateTableLocation(spark, countsT)
      .getOrElse(throw new IllegalStateException(
        s"readBucketCounts($statePrefix): table $countsT not in catalog"))
    val files = m.live.getOrElse(countsT, Set.empty).toSeq.sorted
      .map(n => new org.apache.hadoop.fs.Path(loc, n).toString)
    val rows =
      if (files.isEmpty) spark.table(countsT).limit(0)
      else spark.read.parquet(files: _*)
    rows.groupBy("__bkey").agg(sum("__bcnt").as("__bcnt"))
  }

  /** Connected components over a near-duplicate pair list: assigns every id
    * the minimum id reachable through the pair graph (large-neighborhood
    * label propagation, a.k.a. hash-to-min). Used when dup clusters are NOT
    * near-cliques (chains a~b~c where a,c aren't direct candidates) and the
    * greedy min-id rule of [[minhashDedup]] would over-keep.
    *
    * Scale: two regimes. Up to `maxDriverEdges` the edge list is collected
    * (bounded) and solved exactly with union-find on the driver — one Spark
    * job. Beyond it, iterative label propagation: each iteration is one
    * groupBy-min + join on ids (shuffle volume O(edges)) followed by one
    * POINTER-DOUBLING self-join over the node table (comp := comp(comp)).
    * With the doubling, passes needed ≈ log2(nodes) in practice (measured:
    * a 60k-node / 1.7M-edge geometric graph converged in 17 — the min id
    * is randomly placed, so reach doubles toward it rather than along the
    * diameter), so the default `maxIter` = 32 covers any graph whose node
    * ids fit an int and is a safety bound only — converged loops exit
    * early. Every iteration SEVERS its logical lineage by
    * rebuilding the label frame from its materialized RDD: a lazily
    * chained loop references the previous labels ~3x per pass, and the
    * expanded plan tree that analysis and plan rendering walk grows
    * exponentially (observed: 2 GB plan strings, minutes of driver time
    * per pass, before any task ran). Convergence is checked with a cheap
    * count of changed labels. Both regimes produce identical labels (min
    * reachable id).
    *
    * Cache ownership: BOTH regimes return a frame with no resident cache.
    * The fast path builds a local frame; the iterative path spills the
    * (small — one (id, comp) row per node) label table to the session's
    * checkpoint dir (or a JVM-temp dir in local mode, deleted on exit;
    * or a localCheckpoint on a cluster with no checkpoint dir configured)
    * and returns a clean scan of it — dropping the loop caches without
    * the spill would make any later action replay every iteration.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 32,
      maxDriverEdges: Int = 1000000): DataFrame = {
    // Fast path: near-dup pair graphs are orders of magnitude smaller than
    // the corpus (dup rate bounds edges), so up to `maxDriverEdges` the exact
    // answer is one bounded collect + union-find — a single job instead of
    // O(log diameter) shuffle rounds. The default threshold is sized for a
    // plain 1-2 GB driver: 1M collected rows are boxed GenericRows (two
    // boxed ids each) plus a parent HashMap — order hundreds of bytes per
    // edge, so ~low hundreds of MB, NOT the 8B*edges a primitive layout
    // would cost. Above it the distributed hash-to-min loop below is the
    // 100 TB path. The regime decision is a COUNT over the persisted
    // input — one pass that materializes EVERY partition into the cache
    // exactly once, so neither regime re-runs the upstream (LSH candidate
    // generation — the expensive stage). The earlier limit(max+1) probe
    // stopped as soon as it had max+1 rows, leaving the slow path's
    // unscanned partitions uncached: the full edge build then recomputed
    // the upstream for exactly the large inputs where it hurts most.
    // Null ids are dropped up front: a null endpoint has no identity to
    // union on, and both regimes' min/least semantics skip nulls anyway.
    val undirected = pairs
      .filter(col(idA).isNotNull && col(idB).isNotNull)
      .select(col(idA).as("src"), col(idB).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = undirected.count()
    if (nEdges <= maxDriverEdges) {
      val probe = undirected.collect()
      val spark = pairs.sparkSession
      val idType = undirected.schema("src").dataType
      // Must order ids exactly as the distributed loop's least()/min() does,
      // or the two regimes pick different component labels: Spark compares
      // StringType as UTF8String — lexicographic over UTF-8 BYTES — which
      // differs from Java String's UTF-16 char order for supplementary
      // characters. Compare strings by their UTF-8 bytes, unsigned.
      implicit val anyOrd: Ordering[Any] = new Ordering[Any] {
        def compare(x: Any, y: Any): Int = (x, y) match {
          case (a: String, b: String) =>
            val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0
            val n = math.min(ba.length, bb.length)
            while (i < n) {
              val c = (ba(i) & 0xff) - (bb(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            ba.length - bb.length
          case _ => x.asInstanceOf[Comparable[Any]].compareTo(y)
        }
      }
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      probe.foreach { row =>
        val (a, b) = (row.get(0), row.get(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // min-id root so labels match the distributed loop's least() rule
          if (anyOrd.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
        }
      }
      val rows = parent.keysIterator
        .map(id => org.apache.spark.sql.Row(id, find(id))).toSeq
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("comp", idType)))
      undirected.unpersist()
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    }
    val edges = undirected
      .union(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .cache()
    var converged = false
    var i = 0
    // the previous iteration's lineage-severing cache: the CURRENT
    // labels frame is a shallow plan over it, so it stays alive through
    // this iteration's convergence count and is released only then
    var prevSevered: Option[DataFrame] = None
    // Sever the logical lineage each iteration: chaining the iterations
    // as lazy frames references the previous labels ~3x per pass, so the
    // EXPANDED plan tree (what analysis walks and plan descriptions
    // render — sharing in the DAG does not dedupe either) grows ~3^i:
    // at sf3 scale iteration 8+ spent minutes per pass building
    // 2 GB plan strings before any task ran. Rebuilding the frame from
    // its materialized RDD collapses each iteration's plan to ONE
    // LogicalRDD leaf; the cache is CacheManager-owned, so the no-leak
    // contract (unpersist releases it) holds.
    def sever(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val out = spark.createDataFrame(df.rdd, df.schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count() // materialize NOW — the severed plan must never re-plan
      out
    }
    while (!converged && i < maxIter) {
      // each node takes the min label in its closed neighborhood
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val stepped = sever(labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp")))
      // pointer doubling over the severed step: comp := min(comp,
      // comp(comp)). The neighbor-min step alone advances one hop per
      // pass (maxIter would bound the DIAMETER); with the doubling,
      // passes needed ≈ log2(nodes) in practice. Every comp value is a
      // node id present in stepped, so the left join is total; the
      // result is still monotone-decreasing toward the component min.
      val mapping = stepped
        .select(col("id").as("__did"), col("comp").as("__dc"))
      val next = stepped
        .join(mapping, col("comp") === col("__did"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__dc"), col("comp")))
            .as("comp"))
      val changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("id"))
        .filter(col("comp") =!= col("old")).count()
      labels.unpersist() // the initial cache; no-op on later shallow frames
      prevSevered.foreach(_.unpersist())
      prevSevered = Some(stepped)
      labels = next
      converged = changed == 0L
      i += 1
    }
    edges.unpersist()
    undirected.unpersist()
    // each pass is neighbor-min + pointer doubling, so maxIter bounds a
    // duplicate-chain DIAMETER of roughly 2^maxIter. Returning
    // un-converged labels would silently split true clusters into
    // several components — multiple "survivors" per duplicate cluster,
    // under-deduplication with no error — so a hit on the bound fails
    // loudly instead.
    if (!converged) {
      prevSevered.foreach(_.unpersist())
      throw new IllegalStateException(
        "connectedComponents: label propagation did not converge within " +
          s"$maxIter iterations (with pointer doubling, convergence " +
          "needs ~log2(nodes) passes) — raise maxIter rather than " +
          "accepting silently split clusters")
    }
    // spill-and-rescan: the label table is tiny next to the edge stream it
    // came from, and severing the loop lineage lets every iteration cache
    // be released HERE instead of leaking to callers. Three regimes:
    //  - a configured checkpoint dir (shared storage) is the canonical
    //    cluster spill target — parquet there, rescan;
    //  - local mode may spill to a JVM temp dir (same filesystem for
    //    driver and "executors"), registered for deletion at exit;
    //  - a CLUSTER WITHOUT a checkpoint dir must NOT use a driver-local
    //    temp path: executors would write parquet parts to their own
    //    local filesystems and the rescan would silently read
    //    empty/partial labels. Sever lineage with localCheckpoint()
    //    (block-manager-resident, cluster-readable) instead.
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    val result = sc.getCheckpointDir match {
      case None if !sc.isLocal =>
        val out = labels.localCheckpoint()
        labels.unpersist()
        out
      case maybeBase =>
        val base = maybeBase.getOrElse(
          java.nio.file.Files.createTempDirectory("graft-cc").toString)
        val dir = new org.apache.hadoop.fs.Path(
          s"$base/cc-labels-${java.util.UUID.randomUUID()}")
        labels.write.mode("overwrite").parquet(dir.toString)
        labels.unpersist()
        registerCcSpillDir(dir, sc.hadoopConfiguration)
        spark.read.parquet(dir.toString)
    }
    // the final labels frame was shallow over the LAST severed step —
    // releasable only now that the spill has materialized the labels
    prevSevered.foreach(_.unpersist())
    result
  }

  // One static shutdown hook over all connectedComponents spill dirs: the
  // returned frame lazily rescans its dir, so deletion must wait for
  // process exit — but a long-running session (streaming, many jobs) must
  // not accumulate one hook THREAD per call.
  private val ccSpillDirs = new java.util.concurrent.ConcurrentLinkedQueue[
    (org.apache.hadoop.fs.Path, org.apache.hadoop.conf.Configuration)]
  private lazy val ccSpillHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var e = ccSpillDirs.poll()
      while (e != null) {
        try e._1.getFileSystem(e._2).delete(e._1, true)
        catch { case _: Throwable => () }
        e = ccSpillDirs.poll()
      }
    }))
  private def registerCcSpillDir(dir: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    ccSpillHook
    ccSpillDirs.add((dir, conf))
  }

  /** MinHash near-dedup with exact cluster resolution: candidates feed
    * [[connectedComponents]], and each component keeps its minimum id.
    */
  def minhashDedupCC(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    val pairs = minhashCandidates(df, textCol, idCol, shingleK, numHashes,
      bands, threshold, seed = seed)
    val comps = connectedComponents(pairs)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[minhashDedupCC]] with QUALITY-aware representative selection: each
    * near-dup cluster keeps its best document by `score` (descending,
    * id-ascending tiebreak) instead of its minimum id — the curation
    * choice that keeps the clean canonical page rather than whichever
    * scrape happened to enter the corpus first. `score` is any
    * deterministic column over `df`'s rows (e.g.
    * [[graft.functions.TextFunctions.qualityScore]]).
    *
    * Scale shape: identical to [[minhashDedupCC]] up to the component
    * frame (bounded by the dup-pair graph, orders of magnitude below the
    * corpus); the winner per component is one max-struct hash aggregate
    * — (score, -id) partial-combines map-side, no per-cluster sort, no
    * window — and survivors resolve by the same anti join.
    */
  def minhashDedupBest(df: DataFrame, textCol: String, idCol: String,
      score: Column, shingleK: Int = 3, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    val pairs = minhashCandidates(df, textCol, idCol, shingleK, numHashes,
      bands, threshold, seed = seed)
    val comps = connectedComponents(pairs)
    // join BEFORE scoring: the score kernel evaluates only on cluster
    // members (bounded by the dup-pair graph), never the whole corpus.
    // TYPE-PRESERVING join: the former cast("long") id key silently
    // matched NOTHING for string ids (cast -> null), which turned the
    // reps frame empty and the anti-join below deleted EVERY cluster
    // member — representative included
    val scored = comps
      .join(df.select(col(idCol).as("id"), score.as("__sc")), Seq("id"))
      .select(col("id"), col("comp"), col("__sc"))
    // best score per cluster, then SMALLEST id among the best — the
    // same (score desc, id asc) representative rule as before, but
    // expressed without numeric negation so any id type works
    val best = scored.groupBy(col("comp"))
      .agg(max(col("__sc")).as("__best"))
    val reps = scored.join(best, Seq("comp"))
      .filter(col("__sc") === col("__best"))
      .groupBy(col("comp"))
      .agg(min(col("id")).as("id"))
      .select(col("id"))
    val losers = comps.join(reps, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ---------------------------------------------------- weighted (ICWS)

  /** Term-frequency shingle bag of a text column:
    * struct(hashes array<bigint>, weights array<double>). The weighted
    * counterpart of [[shingleHashes]] — same shingle hashing, but repeated
    * shingles keep their multiplicity as a weight.
    */
  def shingleTf(text: Column, k: Int): Column =
    graft.functions.expr.WeightedMinHashExprs.shingleTf(
      TextFunctions.tokens(text), k)

  /** ICWS weighted MinHash signature (Ioffe 2010): each slot matches between
    * two docs with probability equal to their weighted Jaccard
    * Σ min(w_a, w_b) / Σ max(w_a, w_b) — TF-aware where [[minhashSignature]]
    * is set-only.
    */
  def icwsSignature(hashesCol: Column, weightsCol: Column, numHashes: Int,
      seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val seeds = Array.fill(numHashes)(rng.nextLong())
    graft.functions.expr.WeightedMinHashExprs.icwsSignature(
      hashesCol, weightsCol, seeds)
  }

  /** Exact weighted Jaccard between two (hashes, weights) sparse vectors. */
  def weightedJaccard(hashesA: Column, weightsA: Column, hashesB: Column,
      weightsB: Column): Column =
    graft.functions.expr.WeightedMinHashExprs.weightedJaccard(
      hashesA, weightsA, hashesB, weightsB)

  /** Candidate near-duplicate pairs under WEIGHTED Jaccard: ICWS signatures
    * banded exactly like [[minhashCandidates]], verified with the exact
    * Σ min / Σ max similarity. Use over [[minhashCandidates]] when term
    * frequency matters — e.g. spammy corpora where one doc repeats a phrase
    * many times, which set-Jaccard cannot see.
    *
    * Scale shape is identical to the unweighted path: the banded stream
    * carries (band, bandHash, id) only; TF structs join back in for the
    * surviving deduplicated pairs.
    */
  def weightedMinhashCandidates(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands

    // the ICWS signature (numHashes samples x shingles per doc, ~75% of
    // this operator's CPU) evaluates in the stage below — make sure an
    // undersplit source doesn't serialize it (no-op at production scale)
    val withTf = graft.Tables.widenForKernel(df, col(idCol))
      .select(col(idCol), shingleTf(col(textCol), shingleK).as("__tf"))

    val banded = withTf
      .withColumn("__sig", icwsSignature(col("__tf.hashes"),
        col("__tf.weights"), numHashes, seed))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        ).as(Seq("__band", "__bandhash")))

    // same capped-collect bucket guard + local pair expansion as
    // [[minhashCandidates]] — see [[bucketPairs]] for the rationale
    val pairIds = bucketPairs(banded, Seq("__band", "__bandhash"),
      col(idCol), maxBucketSize)
      .select(col("__pair_a").as("id_a"), col("__pair_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Verify WITHOUT a second full-corpus TF pass: the TF expression
    // (tokenize + shingle-hash + sort + aggregate) dominates this
    // operator's CPU, so the verify probe restricts to CANDIDATE docs
    // with a semi-join on candidate ids placed BELOW the TF projection —
    // same shape and same ReuseExchange/AQE rationale as
    // [[minhashCandidates]]: the banded kernel evaluates once, and the
    // verify branch TF-encodes only dup-bounded candidate rows.
    // no .distinct() on candIds, and two plain equi-joins instead of an
    // unpivot/regroup — same reasoning as [[minhashCandidates]]'s verify
    val candIds = pairIds
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
    val candTf = df.select(col(idCol), col(textCol))
      .join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), shingleTf(col(textCol), shingleK).as("__tf"))
      // load-bearing, same as minhashCandidates' verify tail (the r10
      // x75 lesson): candTf feeds BOTH fetch joins below — without one
      // id-keyed exchange to park it under, Catalyst specializes each
      // branch's projection and the TF kernel (and at scale the corpus
      // scan) run once PER SIDE
      .repartition(col(idCol))
    pairIds
      .join(candTf.select(col(idCol).as("id_a"), col("__tf").as("__tf_a")),
        Seq("id_a"))
      .join(candTf.select(col(idCol).as("id_b"), col("__tf").as("__tf_b")),
        Seq("id_b"))
      .withColumn("wjaccard", weightedJaccard(
        col("__tf_a.hashes"), col("__tf_a.weights"),
        col("__tf_b.hashes"), col("__tf_b.weights")))
      .filter(col("wjaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("wjaccard"))
  }

  /** Weighted-Jaccard near-dedup: greedy min-id survivor rule over
    * [[weightedMinhashCandidates]].
    */
  def weightedMinhashDedup(df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    // no .distinct() on losers — see [[minhashDedup]]
    val losers = weightedMinhashCandidates(df, textCol, idCol, shingleK,
      numHashes, bands, threshold, seed = seed)
      .select(col("id_b").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** N-gram Jaccard similarity between two text columns (exact, for
    * verification and small candidate sets).
    */
  def ngramJaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = shingleHashes(a, k)
    val sb = shingleHashes(b, k)
    val inter = size(array_intersect(sa, sb))
    val union = size(sa) + size(sb) - inter
    when(union > 0, inter.cast("double") / union).otherwise(lit(0.0))
  }

  /** 64-bit SimHash of a document (Charikar 2002): per bit position, sum +1/-1
    * votes of each token hash's bit; the sign of the sum is the output bit.
    * Near-identical documents differ in few bits (compare with
    * [[hammingDist]]). Native expression ([[graft.functions.expr.SimHash64Expr]]).
    */
  def simhash64(text: Column): Column =
    graft.functions.expr.TextHashExprs.simhash64(TextFunctions.tokens(text))

  /** Hamming distance between two 64-bit hashes. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash of a document's k-shingle SET (the [[Dedup.shingleHashes]]
    * features): votes over pre-hashed shingles, no string materialization.
    * Unigram-token simhash ([[simhash64]]) approximates bag-of-words cosine
    * and collapses on small-vocabulary/templated corpora — two unrelated
    * docs drawing from the same 20-word vocab land within 3/64 bits (observed
    * on the synthetic corpus: pairs at 0.01 shingle-Jaccard colliding).
    * Shingle features restore near-duplicate semantics (Manku et al. 2007
    * use shingle-grade features for web near-dup at Google scale).
    */
  def simhash64Shingles(text: Column, k: Int = 3): Column =
    graft.functions.expr.TextHashExprs.simhash64OfHashes(shingleHashes(text, k))

  /** SimHash near-dup candidates: block on bit-bands of the simhash (split
    * into `bands` chunks; near-identical docs share at least one chunk when
    * their hamming distance < bands), verify with exact hamming distance.
    * Features are k-shingle hashes ([[simhash64Shingles]]), not unigram
    * tokens — see there for why.
    *
    * `maxBucketSize` caps degenerate (band, chunk) buckets before pair
    * expansion goes quadratic — same capped-collect guard as
    * [[minhashCandidates]]: 16-bit chunks over templated corpora
    * produce mega-buckets (every doc sharing a boilerplate-dominated chunk),
    * and a bucket of b docs is b^2 candidate pairs. Ids inside a dropped
    * bucket can still pair through their other bands.
    */
  def simhashDedup(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, bands: Int = 4,
      maxBucketSize: Int = 10000, shingleK: Int = 3): DataFrame = {
    // the banding recall guarantee is pigeonhole: a pair within
    // maxHamming differing bits shares an identical chunk only when
    // maxHamming < bands — a legal-looking (maxHamming = bands) call
    // would silently never find qualifying duplicates. And bands must
    // divide 64, or the top 64 % bands bits fall outside every chunk
    // and differences there go invisible to candidate generation.
    require(maxHamming >= 0 && maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands): the banding " +
        "guarantee needs at least one chunk the differing bits miss")
    require(64 % bands == 0,
      s"bands ($bands) must divide 64, else the high 64 % bands bits " +
        "escape every chunk")
    val bitsPerBand = 64 / bands
    val withSim = df.select(col(idCol),
      simhash64Shingles(col(textCol), shingleK).as("__simhash"))
    val chunks = array((0 until bands).map(b =>
      shiftright(col("__simhash"), b * bitsPerBand)
        .bitwiseAND(lit((1L << bitsPerBand) - 1))): _*)
    val banded = withSim.select(col(idCol), col("__simhash"),
      posexplode(chunks).as(Seq("__band", "__chunk")))
    // capped-collect bucket guard + local pair expansion (see
    // [[bucketPairs]]); the payload carries (id, simhash) together so the
    // hamming verify needs no join back — struct ordering is id-first,
    // matching the old self-join's id_a < id_b.
    val losers = bucketPairs(banded, Seq("__band", "__chunk"),
      struct(col(idCol).as("id"), col("__simhash").as("sim")),
      maxBucketSize)
      .filter(hammingDist(col("__pair_a.sim"), col("__pair_b.sim"))
        <= maxHamming)
      // no .distinct() on losers — see [[minhashDedup]]
      .select(col("__pair_b.id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact cross-corpus (R-S) prefix-filter similarity join: every
    * (left, right) pair with shingle-set Jaccard >= `threshold`, FULL
    * RECALL — the exact complement to the LSH cross-dedup path
    * ([[crossMinhashDedup]], recall-approximate by construction) and the
    * ground-truth form of train-vs-benchmark decontamination. Same
    * AllPairs/PPJoin machinery as [[prefixFilterPairs]] generalized to
    * two inputs: ONE global rarest-first order over the UNION's shingle
    * frequencies (prefix filtering needs both sides ordered by the same
    * total order), per-side prefixes `n - ceil(t*n) + 1` (valid for R-S:
    * the smallest common token must fall inside BOTH prefixes when
    * overlap >= each side's ceil(t*n)), the length + positional filters,
    * then the exact-Jaccard refilter. No `id < id` constraint — the
    * sides are distinct corpora; ids may collide across them. Same
    * lifecycle contract as the self-join: lazy and cache-neutral, each
    * base feeds several plan branches, so at corpus scale pass
    * PRE-HASHED persisted sets.
    */
  def prefixFilterJoin(left: DataFrame, right: DataFrame, textCol: String,
      idCol: String, threshold: Double, shingleK: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0,1]")
    def baseOf(df: DataFrame) = df.select(col(idCol).as("__id"),
      shinglesOf(df, textCol, shingleK).as("__set"))
      .withColumn("__n", size(col("__set")))
    val bl = baseOf(left)
    val br = baseOf(right)
    val freq = bl.select(explode(col("__set")).as("__g"))
      .unionAll(br.select(explode(col("__set")).as("__g")))
      .groupBy("__g").agg(count(lit(1)).as("__f"))
    val tSafe = lit(threshold - 1e-9) // same ceil-safety as the self-join
    def prefixOf(base: DataFrame) = {
      val ordered = base.select(col("__id"), col("__n"),
          explode(col("__set")).as("__g"))
        .join(freq, "__g")
        .groupBy("__id", "__n")
        .agg(sort_array(collect_list(struct(col("__f"), col("__g"))))
          .as("__o"))
      val prefLen = (col("__n") - ceil(tSafe * col("__n")) + 1)
        .cast("int")
      ordered.select(col("__id"), col("__n"),
        posexplode(slice(transform(col("__o"), s => s.getField("__g")),
          lit(1), prefLen)).as(Seq("__p", "__g")))
    }
    // candidate generation + the PPJoin positional filter — identical
    // derivation to the self-join (one shared total order), aggregated
    // on the SAME (id_l, id_r) key the dedup already needs
    val cand = prefixOf(bl).select(col("__id").as("id_l"),
        col("__n").as("__nl"), col("__p").as("__pl"), col("__g"))
      .join(prefixOf(br).select(col("__id").as("id_r"),
        col("__n").as("__nr"), col("__p").as("__pr"), col("__g")),
        Seq("__g"))
      .where(least(col("__nl"), col("__nr")) >=
        ceil(tSafe * greatest(col("__nl"), col("__nr"))))
      .groupBy("id_l", "id_r", "__nl", "__nr")
      .agg(count(lit(1)).as("__k"),
        max(col("__pl")).as("__mpl"), max(col("__pr")).as("__mpr"))
      .where(col("__k") +
        least(col("__nl") - 1 - col("__mpl"),
          col("__nr") - 1 - col("__mpr")) >=
        tSafe / (lit(1.0) + tSafe) * (col("__nl") + col("__nr")))
      .select("id_l", "id_r")
    cand
      .join(bl.select(col("__id").as("id_l"), col("__set").as("__sl"),
        col("__n").as("__nl")), Seq("id_l"))
      .join(br.select(col("__id").as("id_r"), col("__set").as("__sr"),
        col("__n").as("__nr")), Seq("id_r"))
      .withColumn("__i", size(array_intersect(col("__sl"), col("__sr"))))
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__nl") + col("__nr") - col("__i")))
      .where(col("jaccard") >= threshold)
      .select("id_l", "id_r", "jaccard")
  }

  /** EXACT set-similarity self-join via prefix filtering (AllPairs /
    * PPJoin, Bayardo et al. 2007, Xiao et al. 2008): every pair of
    * documents whose k-shingle SETS have Jaccard >= `threshold`, with
    * FULL RECALL — the guarantee the MinHash-LSH candidate path
    * ([[minhashCandidates]], x03) deliberately trades away (banding can
    * miss a qualifying pair; LSH is recall-approximate even when each
    * candidate is exact-verified). Use this as the ground-truth path and
    * for thresholds/corpora where missing a duplicate is not acceptable.
    *
    * The prefix-filter theorem: order every document's shingles by one
    * GLOBAL total order (ascending corpus frequency, ties by value — the
    * rarest first); if J(a,b) >= t, then a and b must share at least one
    * shingle within each document's first `n - ceil(t*n) + 1` shingles
    * under that order. So indexing only the (rare) prefix shingles
    * produces a candidate superset, and the exact Jaccard refilter makes
    * the result exact.
    *
    * Scale shape: (1) shingle-frequency table — one partial-aggregated
    * groupBy, corpus-vocabulary-sized but fully distributed (never
    * collected); (2) per-doc canonical order — join frequencies back and
    * re-group by doc (collect_list bounded by the doc's own shingle
    * count); (3) the candidate join keys on PREFIX shingles only —
    * postings of the rarest tokens, the published reason this beats the
    * naive all-pairs token join by orders of magnitude; the length
    * filter `min(na,nb) >= ceil(t*max(na,nb))` prunes before the
    * distinct; (4) exact verify joins the two (bounded) set arrays back
    * by id. No cartesian anywhere; every shuffle is keyed (shingle or
    * id) and candidate-bounded. The shingle-set frame feeds FOUR plan
    * branches (frequency, ordering, both verify sides); the operator
    * itself stays lazy and cache-neutral (no persist to leak), so at
    * corpus scale pass PRE-HASHED sets (`array<bigint>` column —
    * [[shinglesOf]] passes them through) persisted by the caller, who
    * owns the lifecycle: kernel once, four cache reads, unpersist when
    * consumed.
    */
  def prefixFilterPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleK: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0,1]")
    // hashed shingle SETS via the native kernel (one primitive loop per
    // doc; the string-shingle HOF view re-tokenizes per element — the
    // CollapseProject trap — and measured 18 s vs ~3 s at sf0.1). Hash
    // equality as shingle identity is the dedup tier's standing
    // convention (x03/x42/x55); the exact-Jaccard refilter below is
    // exact over the hashed sets.
    val base = df.select(col(idCol).as("__id"),
      shinglesOf(df, textCol, shingleK).as("__set"))
      .withColumn("__n", size(col("__set")))
    val freq = base.select(explode(col("__set")).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__f"))
    // canonical order: rarest-first, ties by shingle value — a total
    // order because shingles are distinct within a doc
    val ordered = base.select(col("__id"), col("__n"),
        explode(col("__set")).as("__g"))
      .join(freq, "__g")
      .groupBy("__id", "__n")
      .agg(sort_array(collect_list(struct(col("__f"), col("__g"))))
        .as("__o"))
    // CEIL SAFETY: ceil(t*n) on doubles can overshoot the real ceiling
    // (0.56*25 = 14.000000000000002 -> ceil 15, dropping a qualifying
    // J = 14/25 = 0.56 pair) — a silent recall hole in both the prefix
    // length and the length filter. All candidate-stage bounds therefore
    // use t minus a sub-rounding epsilon: when t*n is non-integral the
    // ceiling is unchanged; when it is integral (or the product rounded
    // up) the bound relaxes by at most one — strictly conservative, and
    // the exact-Jaccard refilter below restores tightness. Valid while
    // eps exceeds the product's rounding error, i.e. n below ~1e7
    // shingles per document.
    val tSafe = lit(threshold - 1e-9)
    val prefLen = (col("__n") - ceil(tSafe * col("__n")) + 1)
      .cast("int")
    // prefix rows carry the 0-based POSITION within the doc's
    // globally-ordered set (prefix = its first prefLen elements), which
    // feeds the positional filter below
    val prefix = ordered.select(col("__id"), col("__n"),
      posexplode(slice(transform(col("__o"), s => s.getField("__g")),
        lit(1), prefLen)).as(Seq("__p", "__g")))
    // POSITIONAL FILTER (PPJoin, Xiao et al. 2008): both sets are sorted
    // by the SAME total order, so the k matched prefix tokens interleave
    // identically — the max matched positions (mpa, mpb) on both sides
    // belong to the same (largest) matched token, every common token
    // smaller than it is necessarily prefix-prefix matched (counted in
    // k), and every common token larger than it sits after BOTH
    // positions. Hence overlap <= k + min(na-1-mpa, nb-1-mpb), and
    // J >= t requires overlap >= t/(1+t)*(na+nb). Using tSafe keeps the
    // bound strictly conservative (never prunes a qualifying pair); the
    // exact-Jaccard refilter below restores tightness. The aggregation
    // replaces the old distinct() — SAME shuffle key (id_a, id_b), so
    // the filter is free shuffle-wise and prunes candidates before the
    // expensive set-fetch joins and array_intersect.
    val cand = prefix.select(col("__id").as("id_a"), col("__n").as("__na"),
        col("__p").as("__pa"), col("__g"))
      .join(prefix.select(col("__id").as("id_b"), col("__n").as("__nb"),
        col("__p").as("__pb"), col("__g")), Seq("__g"))
      .where(col("id_a") < col("id_b") &&
        least(col("__na"), col("__nb")) >=
          ceil(tSafe * greatest(col("__na"), col("__nb"))))
      .groupBy("id_a", "id_b", "__na", "__nb")
      .agg(count(lit(1)).as("__k"),
        max(col("__pa")).as("__mpa"), max(col("__pb")).as("__mpb"))
      .where(col("__k") +
        least(col("__na") - 1 - col("__mpa"),
          col("__nb") - 1 - col("__mpb")) >=
        tSafe / (lit(1.0) + tSafe) * (col("__na") + col("__nb")))
      .select("id_a", "id_b")
    cand
      .join(base.select(col("__id").as("id_a"), col("__set").as("__sa"),
        col("__n").as("__na")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__set").as("__sb"),
        col("__n").as("__nb")), Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__na") + col("__nb") - col("__i")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
