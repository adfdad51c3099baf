package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, ExpressionEncoder}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable sketch aggregators (typed `Aggregator`s, the Spark UDAF
  * surface). Both are ALGEBRAIC — `merge` is associative+commutative — so
  * Catalyst runs them as partial aggregates with map-side combine: the
  * shuffle carries one fixed-size buffer per (partition, group), never the
  * raw values. That property is what makes them usable as GROUP BY
  * aggregates at 100 TB where collect_set would OOM.
  */
object Aggregators {

  // array<bigint> encoder for buffers/outputs: fixed-width primitive
  // serialization, not Java serialization — the buffer crosses the shuffle
  private def longArrayEnc: Encoder[Array[Long]] =
    ExpressionEncoder(AgnosticEncoders.ArrayEncoder(
      AgnosticEncoders.PrimitiveLongEncoder, containsNull = false))

  /** Per-group MinHash signature over pre-hashed elements (xxhash64 values):
    * the signature of the UNION of the group's element set. Two groups'
    * signatures estimate their Jaccard via slot agreement — the group-level
    * counterpart of the per-document [[graft.functions.expr.MinHashSignatureExpr]]
    * (identical seeding, so document and group signatures are comparable).
    *
    * Use case: "which domains / languages / sources share content" without
    * materializing any group's element set.
    */
  class MinHashUnion(numHashes: Int, seed: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inits: Array[Long] = {
      val rng = new scala.util.Random(seed)
      Array.fill(numHashes)(XXH64.hashLong(rng.nextLong(), 42L))
    }

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], elemHash: Long): Array[Long] = {
      var s = 0
      while (s < inits.length) {
        val h = XXH64.hashLong(elemHash, inits(s))
        if (h < buf(s)) buf(s) = h
        s += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var s = 0
      while (s < a.length) { if (b(s) < a(s)) a(s) = b(s); s += 1 }
      a
    }

    // empty-group slots fall back to the per-seed init, matching the
    // document-side expression's empty-set convention
    override def finish(buf: Array[Long]): Array[Long] = {
      val out = new Array[Long](buf.length)
      var s = 0
      while (s < buf.length) {
        out(s) = if (buf(s) == Long.MaxValue) inits(s) else buf(s)
        s += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** Deterministic bottom-k sketch over pre-hashed elements: keeps the k
    * smallest distinct hash values per group. One buffer serves three
    * reads:
    *  - a uniform, repartition-invariant SAMPLE of k distinct elements per
    *    group (hash order is a random-but-fixed permutation);
    *  - the KMV distinct-count estimate (k-1) / U(k-th min) (Bar-Yossef
    *    et al. 2002);
    *  - a bounded representative set for drill-down joins.
    */
  class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0)

    override def zero: Array[Long] = Array.empty

    // sorted-insert into a bounded sorted buffer; O(log k) search + memmove
    override def reduce(buf: Array[Long], elemHash: Long): Array[Long] = {
      val h = XXH64.hashLong(elemHash, 42L) // decorrelate from input order
      insert(buf, h)
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i)); i += 1 }
      out
    }

    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = {
        var lo = 0
        var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(mid) < h) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (pos < buf.length && buf(pos) == h) buf // distinct-only
      else if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = h
        System.arraycopy(buf, pos, out, pos + 1, buf.length - pos)
        out
      } else if (pos < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = h
        System.arraycopy(buf, pos, out, pos + 1, k - pos - 1)
        out
      } else buf
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** Mergeable SpaceSaving heavy-hitters sketch (Metwally et al. 2005;
    * mergeability per Agarwal et al. 2012): at most `capacity` counters of
    * (item, count, err). Guarantees: every item with true frequency
    * > N/capacity is present, and reported count overestimates truth by at
    * most the recorded `err`. The buffer is O(capacity) regardless of
    * cardinality — the scale answer to "top domains/tokens" where an exact
    * groupBy would shuffle the full key space.
    */
  class SpaceSaving(capacity: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, (Long, Long)],
        Seq[(String, Long, Long)]] {
    require(capacity > 0)
    private type Buf = scala.collection.mutable.HashMap[String, (Long, Long)]

    override def zero: Buf = scala.collection.mutable.HashMap.empty

    override def reduce(buf: Buf, item: String): Buf = {
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + 1L, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          // evict the min-count entry; inherit its count as error bound
          val (minItem, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
          buf.remove(minItem)
          buf.update(item, (minC + 1L, minC))
      }
      buf
    }

    override def merge(a: Buf, b: Buf): Buf = {
      // sum counts/errors itemwise, then trim back to capacity keeping the
      // largest counts; trimmed mass is bounded by the dropped counts,
      // which the per-item err of survivors already dominates
      b.foreach { case (k, (cb, eb)) =>
        val (ca, ea) = a.getOrElse(k, (0L, 0L))
        a.update(k, (ca + cb, ea + eb))
      }
      if (a.size <= capacity) a
      else {
        val keep = a.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
          .take(capacity)
        val out: Buf = scala.collection.mutable.HashMap.empty
        keep.foreach { case (k, v) => out.update(k, v) }
        out
      }
    }

    // deterministic order: by count desc, then item
    override def finish(buf: Buf): Seq[(String, Long, Long)] =
      buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
        .sortBy { case (k, c, _) => (-c, k) }

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder()
  }

  /** Input row of [[DenseGrad]]: hashed feature buckets, raw error
    * gradient, feature count, and which streams the row feeds (`grad` =
    * weight/bias gradients, `stat` = row count + document frequency — the
    * mini-batch path sources stats from the FULL frame while gradients
    * come from the sample).
    */
  case class GradIn(b: Array[Int], g: Double, nf: Int,
    grad: Boolean, stat: Boolean)

  /** [[DenseGrad]] buffer/output: `grads(0..numBuckets-1)` per-bucket
    * gradient sums, `grads(numBuckets)` bias gradient, `grads(numBuckets+1)`
    * row count; `df(b)` per-bucket document frequency (empty unless
    * requested).
    */
  case class GradBuf(grads: Array[Double], df: Array[Long])

  /** Dense batch-gradient accumulator for the hashed-n-gram classifier
    * ([[graft.operators.HashNgramClassifier.fit]]): per task ONE
    * `Array[Double](numBuckets + 2)` accumulates every row's per-bucket
    * gradient contributions (g/nf per occurrence), bias gradient, and —
    * on request — row count and per-bucket document frequency. Merge is
    * elementwise array addition, so the shuffle carries one fixed ~8·B
    * buffer per partition instead of an exploded (bucket, contribution)
    * row per FEATURE OCCURRENCE — the explode+groupBy formulation this
    * replaces shuffled O(corpus tokens) structs per epoch, which was the
    * whole per-epoch cost at bench scale. Only sane for table widths that
    * fit a task buffer (classifier hash tables, 2^12..2^20 buckets: 32 KB
    * .. 8 MB) — NOT a general replacement for groupBy aggregation.
    */
  class DenseGrad(numBuckets: Int, withDf: Boolean)
      extends Aggregator[GradIn, GradBuf, GradBuf] {

    override def zero: GradBuf = GradBuf(
      new Array[Double](numBuckets + 2),
      new Array[Long](if (withDf) numBuckets else 0))

    override def reduce(buf: GradBuf, in: GradIn): GradBuf = {
      if (in.grad) {
        val inv = in.g / math.max(in.nf, 1)
        var i = 0
        while (i < in.b.length) { buf.grads(in.b(i)) += inv; i += 1 }
        buf.grads(numBuckets) += in.g
      }
      if (in.stat) {
        buf.grads(numBuckets + 1) += 1.0
        if (withDf && in.b.length > 0) {
          // document frequency counts each bucket once per row
          val sorted = in.b.clone()
          java.util.Arrays.sort(sorted)
          var i = 0
          while (i < sorted.length) {
            if (i == 0 || sorted(i) != sorted(i - 1)) buf.df(sorted(i)) += 1L
            i += 1
          }
        }
      }
      buf
    }

    override def merge(a: GradBuf, b: GradBuf): GradBuf = {
      var i = 0
      while (i < a.grads.length) { a.grads(i) += b.grads(i); i += 1 }
      i = 0
      while (i < a.df.length) { a.df(i) += b.df(i); i += 1 }
      a
    }

    override def finish(buf: GradBuf): GradBuf = buf
    override def bufferEncoder: Encoder[GradBuf] = Encoders.product[GradBuf]
    override def outputEncoder: Encoder[GradBuf] = Encoders.product[GradBuf]
  }

  /** DataFrame-facing dense-gradient aggregate — columns must match
    * [[GradIn]] field order.
    */
  def denseGrad(numBuckets: Int, withDf: Boolean, b: Column, g: Column,
      nf: Column, grad: Column, stat: Column): Column =
    udaf(new DenseGrad(numBuckets, withDf), Encoders.product[GradIn])
      .apply(b, g, nf, grad, stat)

  /** Input row of [[VecSum]] (udaf needs a product encoder). */
  case class VecIn(v: Array[Double])

  /** [[VecSum]] buffer/output: running count + per-dimension sum. */
  case class VecBuf(n: Long, s: Array[Double])

  /** Dense vector-sum accumulator: one `Array[Double](dim)` per task
    * sums every row's vector elementwise (count rides along for the
    * mean). Algebraic like [[DenseGrad]], so a per-label centroid
    * aggregation ships one fixed dim-sized buffer per (partition, label)
    * through the shuffle — never a (label, dim, value) explosion of
    * rows, which is dim x corpus at 100 TB.
    */
  class VecSum(dim: Int) extends Aggregator[VecIn, VecBuf, VecBuf] {
    override def zero: VecBuf = VecBuf(0L, new Array[Double](dim))

    override def reduce(buf: VecBuf, in: VecIn): VecBuf = {
      val x = in.v
      require(x.length == dim, s"vecsum: dim ${x.length} != $dim")
      var i = 0
      while (i < dim) { buf.s(i) += x(i); i += 1 }
      VecBuf(buf.n + 1, buf.s)
    }

    override def merge(a: VecBuf, b: VecBuf): VecBuf = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      VecBuf(a.n + b.n, a.s)
    }

    override def finish(buf: VecBuf): VecBuf = buf
    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  }

  /** DataFrame-facing vector sum over an `array<double>` column. */
  def vecSum(dim: Int, v: Column): Column =
    udaf(new VecSum(dim), Encoders.product[VecIn]).apply(v)

  /** DataFrame-facing SpaceSaving heavy hitters over a string column:
    * array<struct<item, count, err>> sorted by count desc.
    */
  def heavyHitters(item: Column, capacity: Int): Column =
    udaf(new SpaceSaving(capacity), Encoders.STRING).apply(item)

  /** DataFrame-facing MinHash-union aggregate over an elementHash column. */
  def minhashUnion(elemHash: Column, numHashes: Int = 64,
      seed: Long = 42L): Column =
    udaf(new MinHashUnion(numHashes, seed), Encoders.scalaLong)
      .apply(elemHash)

  /** DataFrame-facing bottom-k sketch over an elementHash column. */
  def bottomK(elemHash: Column, k: Int): Column =
    udaf(new BottomK(k), Encoders.scalaLong).apply(elemHash)

  /** Bounded per-group top-k selector: keeps the `k` best `(score, id)`
    * pairs per group, "best" = highest score with smallest-id tiebreak
    * (NaN scores never win). Buffer is two parallel arrays kept best-first
    * and hard-capped at k in reduce, merge, AND finish — the no-Window
    * per-group top-k: `row_number().over(partitionBy(group))` funnels a hot
    * group's every row into one sort task, while this shuffles one <= k
    * buffer per (partition, group). The selection rule is total, so the
    * result is deterministic under any partitioning.
    */
  class TopByScore(k: Int) extends Aggregator[(Double, Long),
      (Array[Double], Array[Long]), (Array[Double], Array[Long])] {
    require(k > 0)

    override def zero: (Array[Double], Array[Long]) =
      (Array.empty[Double], Array.empty[Long])

    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    private def insert(buf: (Array[Double], Array[Long]), s: Double,
        id: Long): (Array[Double], Array[Long]) = {
      val (ss, ids) = buf
      val n = ss.length
      if (s != s) return buf // NaN: never selected
      var pos = 0
      while (pos < n && better(ss(pos), ids(pos), s, id)) pos += 1
      if (pos >= k) return buf
      val m = math.min(n + 1, k)
      val os = new Array[Double](m)
      val oi = new Array[Long](m)
      System.arraycopy(ss, 0, os, 0, pos)
      System.arraycopy(ids, 0, oi, 0, pos)
      os(pos) = s
      oi(pos) = id
      System.arraycopy(ss, pos, os, pos + 1, m - pos - 1)
      System.arraycopy(ids, pos, oi, pos + 1, m - pos - 1)
      (os, oi)
    }

    override def reduce(buf: (Array[Double], Array[Long]),
        in: (Double, Long)): (Array[Double], Array[Long]) =
      insert(buf, in._1, in._2)

    override def merge(a: (Array[Double], Array[Long]),
        b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
      var out = a
      var i = 0
      while (i < b._1.length) { out = insert(out, b._1(i), b._2(i)); i += 1 }
      out
    }

    override def finish(buf: (Array[Double], Array[Long])):
        (Array[Double], Array[Long]) = buf

    override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
      Encoders.tuple(doubleArrayEnc, longArrayEnc)
    override def outputEncoder: Encoder[(Array[Double], Array[Long])] =
      Encoders.tuple(doubleArrayEnc, longArrayEnc)
  }

  private def doubleArrayEnc: Encoder[Array[Double]] =
    ExpressionEncoder(AgnosticEncoders.ArrayEncoder(
      AgnosticEncoders.PrimitiveDoubleEncoder, containsNull = false))

  /** Per-group top-k as `struct(_1: array<double>, _2: array<bigint>)` —
    * scores and ids best-first; `arrays_zip(r._1, r._2)` + explode unpacks.
    */
  def topByScore(score: Column, id: Column, k: Int): Column =
    udaf(new TopByScore(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)

  /** Jaccard estimate between two MinHash-union signatures (slot agreement
    * rate) — plain Spark SQL over the aggregated arrays.
    */
  def sigJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)
  }

  /** KMV distinct-count estimate from a bottom-k sketch: when the sketch is
    * saturated (size == k), (k-1) / normalizedKthMin; otherwise the sketch
    * holds ALL distinct hashes and its size is exact.
    */
  def kmvDistinct(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val kth = element_at(sketch, k).cast("double")
    // map [Long.Min, Long.Max] -> (0, 1)
    val u = (kth - lit(Long.MinValue.toDouble)) /
      lit(2.0 * Long.MaxValue.toDouble)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / u)
  }

  /** Per-group Bloom-filter bit array over pre-hashed (xxhash64) values
    * — the per-FILE membership index behind [[graft.sources
    * .VersionedTable]] point-lookup skipping, where min/max stats are
    * structurally useless (a column uncorrelated with the clustering key
    * spans its full range in every file). Standard double hashing
    * (Kirsch-Mitzenmacher): probe i sets bit `(h1 + i·h2) mod numBits`,
    * shared verbatim by [[BloomBits.contains]] so build and probe cannot
    * drift. Merge is bitwise OR — algebraic, map-side combined; the
    * shuffle carries one numBits/8-byte buffer per (partition, group).
    *
    * No false negatives ever (a miss is PROOF of absence — what makes
    * skip-reads sound); false positives only add files to a read, never
    * rows to a result (the exact predicate re-filters).
    */
  class BloomBits(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, "numHashes must be >= 1")

    override def zero: Array[Long] = new Array[Long](numBits / 64)

    override def reduce(bits: Array[Long], h: Long): Array[Long] = {
      BloomBits.set(bits, h, numHashes)
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Array[Long] = bits
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  object BloomBits {
    @inline private def probe(h: Long, i: Int, numBits: Int): Int = {
      val h2 = (h >>> 32) | 1L // odd second hash
      (((h + i * h2) & Long.MaxValue) % numBits).toInt
    }

    private[graft] def set(bits: Array[Long], h: Long,
        numHashes: Int): Unit = {
      val numBits = bits.length * 64
      var i = 0
      while (i < numHashes) {
        val b = probe(h, i, numBits)
        bits(b >> 6) |= 1L << (b & 63)
        i += 1
      }
    }

    /** Driver-side membership probe against a built bit array. */
    def contains(bits: Array[Long], h: Long, numHashes: Int): Boolean = {
      val numBits = bits.length * 64
      var i = 0
      while (i < numHashes) {
        val b = probe(h, i, numBits)
        if ((bits(b >> 6) & (1L << (b & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** DataFrame-facing bloom-bits aggregate over a pre-hashed column. */
  def bloomBits(hash: Column, numBits: Int, numHashes: Int): Column =
    udaf(new BloomBits(numBits, numHashes), Encoders.scalaLong)(hash)
}
