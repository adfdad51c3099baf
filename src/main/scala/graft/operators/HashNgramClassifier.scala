package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expr.HashNgramExprs

/** fastText-style text quality classifier (Joulin et al. 2016): a logistic
  * model over hashed word-unigram + n-gram buckets, with distributed
  * training that scales to any corpus size.
  *
  * Scale design of `fit`: each epoch is ONE pass over the (cached, hashed)
  * feature table — per-bucket gradients accumulate into a dense
  * per-task array ([[graft.functions.Aggregators.DenseGrad]]), so the
  * epoch's shuffle is one `numBuckets + 2`-slot buffer per partition and
  * the driver-side collect is a fixed few hundred KB regardless of whether
  * the input is 60k rows or 100 TB. This is the same shape batch SGD takes
  * in parameter-server systems, with the partial-aggregate merge playing
  * the parameter-server role. Token arrays are hashed ONCE up front; epochs
  * re-score from compact int bucket arrays.
  *
  * The typical 100 TB use: `fit` on a small labeled sample (quality labels
  * are expensive), then `score` — a codegen-adjacent primitive loop with the
  * weight table riding in the task closure — across the full corpus, and
  * filter on the score column ([[QualityFilter]] composes it with the
  * heuristic signals).
  */
object HashNgramClassifier {

  /** Trained model: weight table + bias; `wordNgrams` is part of the model
    * because scoring must hash features identically to training.
    */
  case class Model(weights: Array[Float], bias: Double, wordNgrams: Int) {
    def numBuckets: Int = weights.length
  }

  /** Int8-quantized model (fastText `-quantize` style): one byte per
    * bucket plus a single symmetric scale — 4x smaller in every task
    * closure / broadcast, integer-exact accumulation at score time.
    * Worst-case score drift vs the float model is `scale / 8`
    * ([[graft.functions.expr.QuantizedHashNgramScoreExpr]]).
    */
  case class QuantizedModel(qweights: Array[Byte], scale: Double,
      bias: Double, wordNgrams: Int) {
    def numBuckets: Int = qweights.length
  }

  /** Symmetric linear int8 quantization: scale = max|w| / 127,
    * q = round(w / scale) ∈ [-127, 127] (no -128, so negation is safe).
    */
  def quantize(model: Model): QuantizedModel = {
    val maxAbs = model.weights.foldLeft(0.0) {
      (m, w) => m.max(math.abs(w.toDouble))
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    QuantizedModel(
      model.weights.map(w => math.round(w / scale).toByte),
      scale, model.bias, model.wordNgrams)
  }

  /** Logistic score in (0,1) of a text column under `model`. */
  def score(text: Column, model: Model): Column =
    HashNgramExprs.score(TextFunctions.tokens(text), model.weights,
      model.bias, model.wordNgrams)

  /** Logistic score under an int8-quantized model — same feature hashing,
    * 1-byte weight table, integer accumulation.
    */
  def scoreQuantized(text: Column, model: QuantizedModel): Column =
    HashNgramExprs.scoreQuantized(TextFunctions.tokens(text),
      model.qweights, model.scale, model.bias, model.wordNgrams)

  /** Feature bucket ids (unigrams + n-grams) — the hashing trick view used
    * by training; exposed for feature-level debugging.
    */
  def buckets(text: Column, numBuckets: Int, wordNgrams: Int): Column =
    HashNgramExprs.buckets(TextFunctions.tokens(text), numBuckets, wordNgrams)

  /** Batch-gradient logistic regression over hashed n-gram features.
    *
    * @param df      training frame
    * @param textCol document text column
    * @param labelCol 0/1 label column (castable to double)
    * @param numBuckets hash table width (fastText default order: 1<<20;
    *                   smaller is fine for quality models)
    * @param wordNgrams max n-gram order (fastText -wordNgrams)
    * @param epochs  gradient steps
    * @param lr      learning rate
    * @param l2      ridge penalty
    * @param momentum heavy-ball coefficient (0 = plain GD); cuts epochs
    *                 roughly in half on smooth quality objectives
    * @param batchFraction per-epoch deterministic sample fraction (<1 =
    *                 mini-batch SGD; seeded per epoch, so runs reproduce)
    * @param minDocFreq buckets seen in fewer docs are frozen at weight 0 —
    *                 fastText-style rare-feature pruning; document
    *                 frequencies ride epoch 0's gradient aggregation (a
    *                 second dense array in the same buffer), so pruning
    *                 costs ZERO extra jobs
    * @param earlyStopTol stop when the epoch's per-doc gradient L2 norm
    *                 changes by less than this fraction epoch-over-epoch
    *                 (0 = off); saves driver-synchronized epoch jobs once
    *                 the objective has flattened
    * @param adagrad per-coordinate adaptive step sizes (Duchi et al. 2011):
    *                 each bucket's step is lr / sqrt(sum of its squared
    *                 gradients). Essential under CLASS IMBALANCE with few
    *                 full-batch epochs: the raw per-bucket gradient is the
    *                 bucket's doc-frequency share of the mean error, so
    *                 frequent-feature weights move ~n/df slower than the
    *                 bias — the bias races to the majority-class logit while
    *                 the features crawl, and the model degenerates to
    *                 majority-vote. AdaGrad equalizes per-coordinate
    *                 progress; all accumulator state is driver-side, so job
    *                 count per epoch is unchanged.
    */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 1 << 15, wordNgrams: Int = 2, epochs: Int = 20,
      lr: Double = 2.0, l2: Double = 1e-6, momentum: Double = 0.0,
      batchFraction: Double = 1.0, minDocFreq: Int = 1,
      earlyStopTol: Double = 0.0, adagrad: Boolean = false): Model = {
    // hash once; epochs iterate over compact (label, buckets, nfeat) rows.
    // Widen first: the feature hashing below and every epoch's
    // score+gradient pass run over this frame's partitioning, and an
    // undersplit source would serialize all of them (no-op at scale).
    val feats = graft.Tables.widenForKernel(df, col(textCol))
      .select(col(labelCol).cast("double").as("__y"),
        buckets(col(textCol), numBuckets, wordNgrams).as("__b"))
      .withColumn("__nf", greatest(size(col("__b")), lit(1)))
      .cache()
    // The row count n scales gradients but is only USED driver-side after
    // each epoch's collect — so on the full-batch path it rides epoch 0's
    // aggregation as sentinel bucket -2 instead of costing a separate
    // count() job (every epoch is a full driver sync; job count is the
    // latency budget here). Mini-batch still needs the true n up front to
    // size nEpoch.
    var n = -1.0
    // rare-bucket freeze mask: filled from epoch 0's single aggregation on
    // BOTH paths. Sampled epochs must not decide document frequency (a
    // df-5 bucket shows 0-1 docs in a 10% sample and would be frozen by
    // sampling noise), so on the mini-batch path the FULL frame's count
    // sentinel and df stream union into epoch 0's gradient job — same
    // shuffle, no separate pre-pass jobs.
    val frozen: java.util.BitSet = new java.util.BitSet(numBuckets)

    val w = new Array[Float](numBuckets)
    val vel = new Array[Double](numBuckets)
    // AdaGrad squared-gradient accumulators (allocated only when used)
    val gsq = if (adagrad) new Array[Double](numBuckets) else null
    var biasGsq = 0.0
    val adaEps = 1e-8
    var biasVel = 0.0
    var bias = 0.0
    var epoch = 0
    var prevGradNorm = -1.0
    var stopped = false
    while (epoch < epochs && !stopped) {
      // snapshot so this epoch's tasks see a stable table while the driver
      // updates `w` after the actions complete
      val wEpoch = w.clone()
      val epochRows =
        if (batchFraction >= 1.0) feats
        else feats.sample(withReplacement = false, batchFraction,
          seed = 42L + epoch)
      val g = epochRows
        .withColumn("__p", HashNgramExprs.bucketScore(col("__b"), wEpoch, bias))
        .withColumn("__g", col("__p") - col("__y"))
      // ONE job per epoch, ZERO corpus-sized shuffle: the dense-gradient
      // aggregate ([[graft.functions.Aggregators.DenseGrad]]) accumulates
      // per-bucket gradients into one Array[Double](numBuckets + 2) per
      // task — bias and row count ride the same buffer, per-bucket
      // document frequency rides epoch 0's when pruning is on — and the
      // shuffle carries one such buffer per partition. The former
      // explode+groupBy formulation shuffled one struct per feature
      // OCCURRENCE per epoch (O(corpus tokens) rows), which was the
      // entire per-epoch cost at bench scale. On the mini-batch path the
      // count/df contributions come from the FULL frame unioned into the
      // sampled gradient stream — still one job.
      val needDf = epoch == 0 && minDocFreq > 1
      val gradIn = g.select(col("__b"), col("__g"), col("__nf"),
        lit(true).as("__grad"),
        lit(epoch == 0 && batchFraction >= 1.0).as("__stat"))
      val aggRows =
        if (epoch == 0 && batchFraction < 1.0)
          gradIn.unionByName(feats.select(col("__b"), lit(0.0).as("__g"),
            col("__nf"), lit(false).as("__grad"), lit(true).as("__stat")))
        else gradIn
      val out = aggRows.select(
        graft.functions.Aggregators.denseGrad(numBuckets, needDf,
          col("__b"), col("__g"), col("__nf"), col("__grad"),
          col("__stat")).as("__o"))
        .head().getStruct(0)
      val gsum = out.getAs[scala.collection.Seq[Double]](0)
      if (epoch == 0) {
        n = gsum(numBuckets + 1)
        require(n > 0, "fit needs a non-empty training frame")
        if (minDocFreq > 1) {
          val dfArr = out.getAs[scala.collection.Seq[Long]](1)
          var b = 0
          while (b < numBuckets) {
            if (dfArr(b) < minDocFreq) frozen.set(b)
            b += 1
          }
        }
      }
      val nEpoch = if (batchFraction >= 1.0) n else math.max(1.0,
        n * batchFraction)
      var gradSq = 0.0
      var gBias = gsum(numBuckets) / nEpoch
      gradSq += gBias * gBias
      if (adagrad) {
        biasGsq += gBias * gBias
        gBias /= math.sqrt(biasGsq + adaEps)
      }
      biasVel = momentum * biasVel + gBias
      bias -= lr * biasVel
      var b = 0
      while (b < numBuckets) {
        val s = gsum(b)
        // zero-sum buckets had no occurrences this epoch — skipped, the
        // sparse formulation's absent-row semantics (no l2/momentum step)
        if (s != 0.0 && !frozen.get(b)) {
          val gRaw = s / nEpoch
          gradSq += gRaw * gRaw
          var grad = gRaw + l2 * w(b)
          if (adagrad) {
            gsq(b) += grad * grad
            grad /= math.sqrt(gsq(b) + adaEps)
          }
          vel(b) = momentum * vel(b) + grad
          w(b) = (w(b) - lr * vel(b)).toFloat
        }
        b += 1
      }
      val gradNorm = math.sqrt(gradSq)
      if (earlyStopTol > 0.0 && prevGradNorm >= 0.0 &&
          math.abs(gradNorm - prevGradNorm) <=
            earlyStopTol * math.max(prevGradNorm, 1e-12))
        stopped = true
      prevGradNorm = gradNorm
      epoch += 1
    }
    feats.unpersist()
    Model(w, bias, wordNgrams)
  }

  /** One-vs-all multiclass: one binary [[fit]] per distinct label (labels
    * collected driver-side — class cardinality is small by nature), scored
    * by argmax. Each binary fit reuses the same cached hashed features
    * through [[fit]]'s own pipeline; classes train sequentially, so the
    * total cost is `numClasses x` the binary cost — fastText's exact
    * softmax would share one pass, but one-vs-all composes with every
    * binary option (momentum, pruning, mini-batch) unchanged.
    */
  def fitMulticlass(df: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 1 << 15, wordNgrams: Int = 2, epochs: Int = 20,
      lr: Double = 2.0, l2: Double = 1e-6, momentum: Double = 0.0,
      minDocFreq: Int = 1, earlyStopTol: Double = 0.0): Map[String, Model] = {
    val raw = df.select(col(labelCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    // a null label used to surface as an opaque NPE inside .sorted —
    // name the actual problem instead
    require(!raw.contains(null),
      "fitMulticlass: labelCol contains NULL — labels must be non-null")
    val labels = raw.sorted
    require(labels.length >= 2, "multiclass needs >= 2 labels")
    labels.map { lbl =>
      val bin = df.withColumn("__y01",
        (col(labelCol).cast("string") === lbl).cast("double"))
      lbl -> fit(bin, textCol, "__y01", numBuckets, wordNgrams, epochs, lr,
        l2, momentum, minDocFreq = minDocFreq, earlyStopTol = earlyStopTol)
    }.toMap
  }

  /** Argmax prediction column over a multiclass model set: ties break on
    * label order for determinism.
    */
  def predictMulticlass(text: Column, models: Map[String, Model]): Column = {
    val scored = models.toSeq.sortBy(_._1).map { case (lbl, m) =>
      struct(score(text, m).as("s"), lit(lbl).as("l"))
    }
    // lexicographic struct sort: by score, then label — the last element is
    // the max score, ties resolving deterministically to the largest label.
    // NULL text gets a NULL prediction: every score is null there, so the
    // struct sort would otherwise fall through to label order and silently
    // classify a missing document as the lexicographically-largest class.
    when(text.isNotNull,
      element_at(array_sort(array(scored: _*)), -1)("l"))
  }
}
