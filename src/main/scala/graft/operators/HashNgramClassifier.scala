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
  * feature table — per-bucket gradients come from an explode + groupBy whose
  * result cardinality is bounded by `numBuckets`, never by corpus size, so
  * the driver-side collect is a fixed few hundred KB regardless of whether
  * the input is 60k rows or 100 TB. This is the same shape batch SGD takes
  * in parameter-server systems, with the DataFrame shuffle playing the
  * parameter-server role. Token arrays are hashed ONCE up front; epochs
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

  /** Logistic score in (0,1) of a text column under `model`. */
  def score(text: Column, model: Model): Column =
    HashNgramExprs.score(TextFunctions.tokens(text), model.weights,
      model.bias, model.wordNgrams)

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
    *                 fastText-style rare-feature pruning; one extra bounded
    *                 aggregation up front, less hash-collision noise
    */
  def fit(df: DataFrame, textCol: String, labelCol: String,
      numBuckets: Int = 1 << 15, wordNgrams: Int = 2, epochs: Int = 20,
      lr: Double = 2.0, l2: Double = 1e-6, momentum: Double = 0.0,
      batchFraction: Double = 1.0, minDocFreq: Int = 1): Model = {
    // hash once; epochs iterate over compact (label, buckets, nfeat) rows
    val feats = df
      .select(col(labelCol).cast("double").as("__y"),
        buckets(col(textCol), numBuckets, wordNgrams).as("__b"))
      .withColumn("__nf", greatest(size(col("__b")), lit(1)))
      .cache()
    val n = feats.count().toDouble
    require(n > 0, "fit needs a non-empty training frame")

    // rare-bucket freeze mask: document frequency per bucket, bounded rows
    val frozen: java.util.BitSet = new java.util.BitSet(numBuckets)
    if (minDocFreq > 1) {
      feats.select(explode(array_distinct(col("__b"))).as("__bk"))
        .groupBy("__bk").agg(count(lit(1)).as("__df"))
        .filter(col("__df") < minDocFreq)
        .collect()
        .foreach(r => frozen.set(r.getInt(0)))
    }

    val w = new Array[Float](numBuckets)
    val vel = new Array[Double](numBuckets)
    var biasVel = 0.0
    var bias = 0.0
    var epoch = 0
    while (epoch < epochs) {
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
      // ONE job per epoch: bucket gradients plus the bias gradient riding
      // as sentinel bucket -1; result rows <= numBuckets + 1, independent
      // of corpus size
      val contribs = concat(
        array(struct(lit(-1).as("__bk"), col("__g").as("__gv"))),
        transform(col("__b"), b =>
          struct(b.as("__bk"), (col("__g") / col("__nf")).as("__gv"))))
      val grads = g
        .select(explode(contribs).as("__c"))
        .groupBy(col("__c.__bk").as("__bk"))
        .agg(sum(col("__c.__gv")).as("__s"))
        .collect()
      val nEpoch = if (batchFraction >= 1.0) n else math.max(1.0,
        n * batchFraction)
      grads.foreach { r =>
        val b = r.getInt(0)
        if (b == -1) {
          biasVel = momentum * biasVel + r.getDouble(1) / nEpoch
          bias -= lr * biasVel
        } else if (!frozen.get(b)) {
          val grad = r.getDouble(1) / nEpoch + l2 * w(b)
          vel(b) = momentum * vel(b) + grad
          w(b) = (w(b) - lr * vel(b)).toFloat
        }
      }
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
      minDocFreq: Int = 1): Map[String, Model] = {
    val labels = df.select(col(labelCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted
    require(labels.length >= 2, "multiclass needs >= 2 labels")
    labels.map { lbl =>
      val bin = df.withColumn("__y01",
        (col(labelCol).cast("string") === lbl).cast("double"))
      lbl -> fit(bin, textCol, "__y01", numBuckets, wordNgrams, epochs, lr,
        l2, momentum, minDocFreq = minDocFreq)
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
    // the max score, ties resolving deterministically to the largest label
    element_at(array_sort(array(scored: _*)), -1)("l")
  }
}
