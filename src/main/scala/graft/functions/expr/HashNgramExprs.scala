package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-n-gram text classification (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"): features are word
  * unigrams plus hashed word n-grams, bucketed modulo a fixed table size;
  * a document's score is the mean of its buckets' weights through a
  * logistic link. The model is just a weight table — training can happen
  * anywhere (here, in `graft.operators.HashNgramClassifier`, or an external
  * fastText run whose quantized weights are loaded into the same layout).
  */

/** Feature bucket ids of a token array: one bucket per unigram and, when
  * `wordNgrams` > 1, per n-gram up to that order (fastText's hashing trick).
  * Buckets are NOT deduplicated — multiplicity is the feature count, and the
  * scorer mean-pools over all occurrences exactly like fastText.
  */
case class HashNgramBucketsExpr(child: Expression, numBuckets: Int,
    wordNgrams: Int)
    extends UnaryExpression with CodegenFallback {
  require(numBuckets > 0 && wordNgrams >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // the malformed-input poisons above/below can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_ngram_buckets expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      // a null token is malformed classifier input (the tokenizers never
      // emit one): poison the row to NULL rather than NPE mid-task or —
      // on unsafe arrays — silently hash an empty string
      if (s == null) return null
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      i += 1
    }
    // unigrams + n-grams (2..wordNgrams), hash-chained like shingles
    var total = 0
    var g = 1
    while (g <= wordNgrams) { total += math.max(0, n - g + 1); g += 1 }
    val out = new Array[Int](total)
    var o = 0
    g = 1
    while (g <= wordNgrams) {
      var s0 = 0
      val m = n - g + 1
      while (s0 < m) {
        var h = 42L
        var j = 0
        while (j < g) { h = XXH64.hashLong(th(s0 + j), h); j += 1 }
        out(o) = ((h % numBuckets + numBuckets) % numBuckets).toInt
        o += 1
        s0 += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hash_ngram_buckets"
}

/** Logistic score of a token array under a hashed-n-gram linear model:
  * sigmoid(bias + mean(weights[bucket])). The weight table rides inside the
  * expression (plan-serialized, broadcast with the task closure) — fine up
  * to a few million float buckets; beyond that, pre-explode buckets and
  * join a weight table instead.
  */
case class HashNgramScoreExpr(child: Expression, weights: Array[Float],
    bias: Double, wordNgrams: Int)
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty && wordNgrams >= 1)

  override def dataType: DataType = DoubleType
  // the malformed-input poisons above/below can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_ngram_score expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val numBuckets = weights.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      // a null token is malformed classifier input (the tokenizers never
      // emit one): poison the row to NULL rather than NPE mid-task or —
      // on unsafe arrays — silently hash an empty string
      if (s == null) return null
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      i += 1
    }
    var sum = 0.0
    var cnt = 0
    var g = 1
    while (g <= wordNgrams) {
      var s0 = 0
      val m = n - g + 1
      while (s0 < m) {
        var h = 42L
        var j = 0
        while (j < g) { h = XXH64.hashLong(th(s0 + j), h); j += 1 }
        sum += weights(((h % numBuckets + numBuckets) % numBuckets).toInt)
        cnt += 1
        s0 += 1
      }
      g += 1
    }
    val z = bias + (if (cnt > 0) sum / cnt else 0.0)
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hash_ngram_score"
}

/** Int8-quantized variant of [[HashNgramScoreExpr]] (fastText `-quantize`
  * style, Joulin et al. 2016 §3): the weight table is symmetric linearly
  * quantized to ONE BYTE per bucket with a single table-wide scale
  * (q = round(w / scale), scale = max|w| / 127), so a 2^20-bucket table
  * rides the task closure at 1 MB instead of 4 MB — at 100 TB the scorer
  * is shipped to every task scoring billions of documents, and closure
  * bytes are broadcast bytes. Accumulation is INTEGER (exact in Long, no
  * float-association drift); one float multiply rescales at the end:
  * sigmoid(bias + scale * qsum / cnt). Worst-case score error vs the float
  * table is scale/8 (per-bucket quantization error <= scale/2, mean
  * preserves it, sigmoid is 1/4-Lipschitz).
  */
case class QuantizedHashNgramScoreExpr(child: Expression,
    qweights: Array[Byte], scale: Double, bias: Double, wordNgrams: Int)
    extends UnaryExpression with CodegenFallback {
  require(qweights.nonEmpty && wordNgrams >= 1)

  override def dataType: DataType = DoubleType
  // the malformed-input poisons above/below can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_ngram_score_q8 expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val numBuckets = qweights.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      // a null token is malformed classifier input (the tokenizers never
      // emit one): poison the row to NULL rather than NPE mid-task or —
      // on unsafe arrays — silently hash an empty string
      if (s == null) return null
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      i += 1
    }
    var qsum = 0L
    var cnt = 0
    var g = 1
    while (g <= wordNgrams) {
      var s0 = 0
      val m = n - g + 1
      while (s0 < m) {
        var h = 42L
        var j = 0
        while (j < g) { h = XXH64.hashLong(th(s0 + j), h); j += 1 }
        qsum += qweights(((h % numBuckets + numBuckets) % numBuckets).toInt)
        cnt += 1
        s0 += 1
      }
      g += 1
    }
    val z = bias + (if (cnt > 0) scale * qsum / cnt else 0.0)
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hash_ngram_score_q8"
}

/** Logistic score from precomputed bucket ids: sigmoid(bias +
  * mean(weights[bucket])). The training loop re-scores each epoch from
  * cached int arrays through this, skipping re-tokenization/re-hashing.
  */
case class BucketMeanScoreExpr(child: Expression, weights: Array[Float],
    bias: Double)
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty)

  override def dataType: DataType = DoubleType
  // the malformed-input poisons above/below can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_mean_score expects array<int>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bs = v.asInstanceOf[ArrayData].toIntArray()
    var sum = 0.0
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      // an out-of-range bucket id means the cached buckets and this
      // weights vector come from DIFFERENT models (stale numBuckets):
      // NULL, like the PQ code-validating kernels — never an AIOOBE
      // mid-scan, never a plausible score from the wrong feature space
      if (b < 0 || b >= weights.length) return null
      sum += weights(b); i += 1
    }
    val z = bias + (if (bs.length > 0) sum / bs.length else 0.0)
    1.0 / (1.0 + math.exp(-z))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bucket_mean_score"
}

object HashNgramExprs {
  def buckets(tokens: Column, numBuckets: Int, wordNgrams: Int): Column =
    ColumnBridge.column(HashNgramBucketsExpr(
      ColumnBridge.expression(tokens), numBuckets, wordNgrams))

  def score(tokens: Column, weights: Array[Float], bias: Double,
      wordNgrams: Int): Column =
    ColumnBridge.column(HashNgramScoreExpr(
      ColumnBridge.expression(tokens), weights, bias, wordNgrams))

  def bucketScore(buckets: Column, weights: Array[Float],
      bias: Double): Column =
    ColumnBridge.column(BucketMeanScoreExpr(
      ColumnBridge.expression(buckets), weights, bias))

  def scoreQuantized(tokens: Column, qweights: Array[Byte], scale: Double,
      bias: Double, wordNgrams: Int): Column =
    ColumnBridge.column(QuantizedHashNgramScoreExpr(
      ColumnBridge.expression(tokens), qweights, scale, bias, wordNgrams))
}
