package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native expressions for weighted (ICWS) MinHash — the TF-weighted upgrade
  * of the dedup family's set-Jaccard LSH. Plain MinHash treats every shingle
  * equally, so a doc that repeats a rare phrase ten times looks identical to
  * one that mentions it once; ICWS (Ioffe, "Improved Consistent Weighted
  * Sampling", ICDM 2010) samples each signature slot with
  * P[slot matches] = weighted Jaccard  J_w(A,B) = Σ_i min(a_i,b_i) / Σ_i max(a_i,b_i)
  * over the weight vectors, making band-LSH bucket probabilities track the
  * TF (or TF-IDF) similarity instead of the set similarity.
  *
  * All randomness is derived deterministically from (element hash, seed) via
  * chained XXH64, so signatures are reproducible across executors and runs —
  * a hard requirement for LSH banding (both docs must draw the SAME
  * per-element samples).
  */

/** Term-frequency view of the k-shingle bag of a token array:
  * struct(hashes array<bigint> sorted distinct, weights array<double>)
  * where weights[i] is the number of occurrences of hashes[i]. One primitive
  * pass; shares the shingle-chain hashing of [[ShingleHashesExpr]] so the
  * unweighted and weighted paths agree on what a shingle is.
  */
case class ShingleTfExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  // same corpus-collapse guard as ShingleHashesExpr: k <= 0 makes every
  // window hash the bare seed and all documents mutually near-duplicate
  require(k >= 1, s"shingle k must be >= 1, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("hashes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("weights", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_tf expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    // the chain (and its null-window contract) is the SAME code the
    // unweighted kernel runs — TextHashExprs.shingleWindowHashes — so
    // the two paths can never disagree on what a shingle is
    val all: Array[Long] = TextHashExprs.shingleWindowHashes(
      v.asInstanceOf[ArrayData], k)
    java.util.Arrays.sort(all)
    // run-length over the sorted hashes -> (distinct hash, count)
    val m = all.length
    val hOut = new Array[Long](m)
    val wOut = new Array[Double](m)
    var out = 0
    var p = 0
    while (p < m) {
      var q = p + 1
      while (q < m && all(q) == all(p)) q += 1
      hOut(out) = all(p)
      wOut(out) = (q - p).toDouble
      out += 1
      p = q
    }
    InternalRow(
      new GenericArrayData(java.util.Arrays.copyOf(hOut, out)),
      new GenericArrayData(java.util.Arrays.copyOf(wOut, out)))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingle_tf"
}

/** ICWS signature: `seeds.length` weighted samples over (hashes, weights).
  * Each slot is the 64-bit hash of the winning element's (hash, quantized
  * log-weight level t) — both must agree for a slot collision, which is what
  * gives P[match] = J_w (Ioffe 2010, Thm 1).
  *
  * Per (element, seed) the sampler needs r,c ~ Gamma(2,1) and β ~ U(0,1);
  * all five underlying uniforms come from a chained-XXH64 stream keyed by
  * the element hash and the seed, so the draws are consistent across rows —
  * the "consistent" in ICWS.
  */
case class IcwsSignatureExpr(left: Expression, right: Expression,
    seeds: Array[Long])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // the mismatched-pair contract below can return NULL even when both
  // children are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"icws_signature expects (array<bigint>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  // 53-bit mantissa uniform in (0,1): never exactly 0 (log-safe) nor 1
  @inline private def toUniform(h: Long): Double =
    ((h >>> 11) + 0.5) * (1.0 / (1L << 53))

  // splitmix64 finalizer: extends one XXH64 draw into the 5-uniform stream
  // each (element, seed) pair needs — full-period, passes BigCrush, and far
  // cheaper than five independent XXH64 chains
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val hs = lv.asInstanceOf[ArrayData].toLongArray()
    val ws = rv.asInstanceOf[ArrayData].toDoubleArray()
    // a mismatched (hashes, weights) pair is malformed input — silently
    // truncating to the shorter side would yield a plausible-looking
    // signature that quietly under-reports similarity. NULL, like
    // cosine_sim's dimension-mismatch contract
    if (hs.length != ws.length) return null
    val n = hs.length
    // hoist log(w): constant across samples
    val logw = new Array[Double](n)
    var j = 0
    while (j < n) {
      logw(j) = if (ws(j) > 0.0) math.log(ws(j)) else 0.0
      j += 1
    }
    val sig = new Array[Long](seeds.length)
    var s = 0
    while (s < seeds.length) {
      val init = XXH64.hashLong(seeds(s), 42L)
      var bestA = Double.PositiveInfinity
      var bestHash = init
      var bestT = 0L
      var i = 0
      while (i < n) {
        if (ws(i) > 0.0) {
          var h = XXH64.hashLong(hs(i), init)
          val u1 = toUniform(h); h = mix(h)
          val u2 = toUniform(h); h = mix(h)
          val u3 = toUniform(h); h = mix(h)
          val u4 = toUniform(h); h = mix(h)
          val beta = toUniform(h)
          // Gamma(2,1) via -ln(u*u'): fused to ONE log per variate, and the
          // two exps of a = c / (y * e^r) fused to one
          val r = -math.log(u1 * u2)
          val c = -math.log(u3 * u4)
          val t = math.floor(logw(i) / r + beta)
          val a = c * math.exp(-r * (t - beta) - r)
          if (a < bestA) {
            bestA = a
            bestHash = hs(i)
            bestT = java.lang.Double.doubleToLongBits(t)
          }
        }
        i += 1
      }
      sig(s) =
        if (bestA.isInfinity) init // empty / all-zero-weight doc
        else XXH64.hashLong(bestT, XXH64.hashLong(bestHash, init))
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "icws_signature"
}

/** Exact weighted Jaccard Σ min / Σ max between two sparse weight vectors,
  * each given as (sorted-distinct hash array, parallel weight array). A
  * single merge walk over the sorted hash arrays — no set materialization.
  * Used to verify ICWS candidate pairs, exactly as set-Jaccard verifies
  * plain MinHash candidates.
  */
case class WeightedJaccardExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 4,
    "weighted_jaccard(hashesA, weightsA, hashesB, weightsB)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    // every cast is guarded: a non-array child must produce the clean
    // TypeCheckFailure below, not a ClassCastException out of the analyzer
    def elem(i: Int): Option[DataType] = children(i).dataType match {
      case ArrayType(e, _) => Some(e)
      case _ => None
    }
    val ok = elem(0).contains(LongType) && elem(1).contains(DoubleType) &&
      elem(2).contains(LongType) && elem(3).contains(DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "weighted_jaccard expects (array<bigint>, array<double>) x2")
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val ha = vs(0).asInstanceOf[ArrayData].toLongArray()
    val wa = vs(1).asInstanceOf[ArrayData].toDoubleArray()
    val hb = vs(2).asInstanceOf[ArrayData].toLongArray()
    val wb = vs(3).asInstanceOf[ArrayData].toDoubleArray()
    var num = 0.0
    var den = 0.0
    var i = 0
    var j = 0
    while (i < ha.length && j < hb.length) {
      if (ha(i) == hb(j)) {
        num += math.min(wa(i), wb(j)); den += math.max(wa(i), wb(j))
        i += 1; j += 1
      } else if (ha(i) < hb(j)) { den += wa(i); i += 1 }
      else { den += wb(j); j += 1 }
    }
    while (i < ha.length) { den += wa(i); i += 1 }
    while (j < hb.length) { den += wb(j); j += 1 }
    if (den > 0.0) num / den else 0.0
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
  override def prettyName: String = "weighted_jaccard"
}

object WeightedMinHashExprs {
  def shingleTf(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleTfExpr(ColumnBridge.expression(tokens), k))

  def icwsSignature(hashes: Column, weights: Column,
      seeds: Array[Long]): Column =
    ColumnBridge.column(IcwsSignatureExpr(
      ColumnBridge.expression(hashes), ColumnBridge.expression(weights), seeds))

  def weightedJaccard(hashesA: Column, weightsA: Column,
      hashesB: Column, weightsB: Column): Column =
    ColumnBridge.column(WeightedJaccardExpr(Seq(hashesA, weightsA, hashesB,
      weightsB).map(ColumnBridge.expression)))
}
