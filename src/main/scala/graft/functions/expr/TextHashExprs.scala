package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot paths of the dedup
  * family (MinHash/SimHash). The higher-order-function formulations walk
  * token arrays through the lambda interpreter with boxed values —
  * per-element overhead that dominates the dedup stage at corpus scale; these
  * evaluate in one primitive loop per row (xxhash64 family, same algorithm
  * Spark's `xxhash64` function uses).
  */

/** Hashes of the k-gram (word shingle) set of a token array, deduplicated.
  * A shingle's hash is the XXH64 chain over its k token hashes —
  * equivalent fingerprinting power to hashing the joined string without
  * materializing any shingle strings.
  */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  // k <= 0 would make EVERY window chain zero token hashes — the whole
  // corpus collapses onto the single hash {seed} and dedup marks
  // everything a near-duplicate of everything; refuse at construction
  require(k >= 1, s"shingle k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    // window chains + null contract live in ONE place, shared with the
    // TF twin — see TextHashExprs.shingleWindowHashes
    val out = TextHashExprs.shingleWindowHashes(v.asInstanceOf[ArrayData], k)
    val distinct = out.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** MinHash signature: for each seed, the minimum seeded re-hash over the
  * input 64-bit hash set (Broder 1997 with hash-family permutations).
  */
case class MinHashSignatureExpr(child: Expression, seeds: Array[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](seeds.length)
    var s = 0
    while (s < seeds.length) {
      // per-seed initial state: chain the seed into xxhash64's default seed,
      // matching xxhash64(lit(seed), x) = hashLong(x, hashLong(seed, 42))
      val init = XXH64.hashLong(seeds(s), 42L)
      var min = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val h = XXH64.hashLong(hs(i), init)
        if (h < min) min = h
        i += 1
      }
      sig(s) = if (hs.length == 0) init else min
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash over a token array (Charikar 2002): per bit, sum +/-1 votes
  * from each token hash; output bit = sign of the vote.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      // null tokens cast no votes (a feature that isn't there): hashing
      // them as anything would collide with a real token, and getBytes
      // NPE'd here on GenericArrayData inputs
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** SimHash over PRE-HASHED features (array<bigint>): per bit position, +1/-1
  * votes of each feature hash's bit, sign of the sum is the output bit —
  * the Charikar 2002 scheme with the feature hashing already done upstream.
  * Pairs with [[ShingleHashesExpr]] so simhash can run on k-gram shingle
  * features without materializing shingle strings: unigram-token simhash
  * approximates bag-of-words cosine, which collapses on small-vocabulary /
  * templated corpora (any two docs sharing the vocab look alike); shingle
  * features give it near-duplicate semantics (Manku et al., WWW 2007).
  */
case class SimHashOfHashesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64_of_hashes expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData].toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64_of_hashes"
}

/** Count of elements of a 64-bit-hash array present in a FIXED hash set —
  * the probe side of broadcast-set semi-join semantics collapsed into one
  * scalar expression. Exists for benchmark decontamination
  * ([[graft.operators.TextPipeline.flagContaminated]]): the benchmark
  * n-gram set is small by definition, so probing it per document replaces
  * a per-n-gram `posexplode` + broadcast join + per-doc count aggregate
  * (one output row per corpus n-gram — the only corpus-wide row expansion
  * in that stage) with a single projection over the corpus scan.
  *
  * The set rides in the expression itself (serialized with the task
  * binary, broadcast once per stage — same wire cost as a broadcast
  * relation); the open-addressing probe table is built lazily once per
  * deserialized instance, giving O(1) membership per n-gram with zero
  * boxing.
  */
case class LongSetCountExpr(child: Expression, set: Array[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"long_set_count expects array<bigint>, got ${t.catalogString}")
  }

  // Open-addressing linear-probe table at <= 50% load; slot value 0L means
  // empty, so membership of the value 0 itself is tracked out of band.
  @transient private lazy val (table, mask, hasZero) = {
    var cap = 16
    while (cap < set.length * 2) cap <<= 1
    val t = new Array[Long](cap)
    val m = cap - 1
    var zero = false
    var i = 0
    while (i < set.length) {
      val v = set(i)
      if (v == 0L) zero = true
      else {
        var p = mix(v) & m
        while (t(p) != 0L && t(p) != v) p = (p + 1) & m
        t(p) = v
      }
      i += 1
    }
    (t, m, zero)
  }

  // splitmix64 finalizer: full-avalanche scramble so xxhash64 values that
  // share low bits don't cluster probe chains
  @inline private def mix(v: Long): Int = {
    var z = v * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    (z ^ (z >>> 27)).toInt
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      if (h == 0L) { if (hasZero) hits += 1 }
      else {
        var p = mix(h) & mask
        while (table(p) != 0L && table(p) != h) p = (p + 1) & mask
        if (table(p) == h) hits += 1
      }
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "long_set_count"
}

/** Per-term occurrence counts of a token array against a FIXED term list —
  * the tf vector of a bounded query vocabulary (BM25 retrieval,
  * [[graft.operators.TextRank]]), as `array<bigint>` aligned with `terms`.
  * One hash-probe pass over the tokens (O(|doc|), independent of |terms|)
  * instead of |terms| filter-lambda scans; token values probe the map as
  * zero-copy UTF8String views.
  */
case class TermCountsExpr(child: Expression, terms: Array[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) {
      m.putIfAbsent(UTF8String.fromString(terms(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val out = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val ix = index.get(toks.getUTF8String(i))
      if (ix != null) out(ix.intValue()) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "term_counts"
}

/** Word n-gram repetition statistics of one token array, in one primitive
  * pass: `struct<total, n_distinct, top_count, top_ngram>` where ngrams are
  * the space-joined windows of `n` consecutive NON-NULL tokens (a window
  * containing a NULL token contributes nothing — not to `total` either —
  * so `total == sum of counts` always holds) and `top_ngram` is
  * the most frequent one (ties broken toward the UTF-8 BINARY-smallest
  * ngram — `UTF8String` byte order, the collation DuckDB/parquet binary
  * compare uses, so determinism holds on any corpus, not just ASCII:
  * UTF-16 code-unit order would diverge on supplementary-plane text).
  * Feeds the Gopher-style repetition filters
  * (Rae et al. 2021 §A1.1): top-n-gram character fraction and duplicate
  * n-gram fraction derive from these four numbers row-locally, so the
  * corpus never shuffles tokens or n-gram strings — a relational
  * formulation (explode + window) would hash-partition every token of
  * every document.
  */
case class NgramStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_ngram", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.InternalRow
    val toks = v.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val m = len - n + 1
    if (m <= 0)
      return InternalRow(0L, 0L, 0L, null)
    // keys stay UTF8String end-to-end: concatWs joins the window's bytes
    // directly and compareTo is unsigned BYTE order — the cross-engine
    // binary collation the tie-break contract promises (String.compareTo
    // would be UTF-16 code-unit order, diverging beyond the BMP), and no
    // per-ngram String round trip in the hot loop
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Long]()
    val window = new Array[UTF8String](n)
    var total = 0L
    var i = 0
    while (i < m) {
      var j = 0
      var hasNull = false
      while (j < n) {
        val t = toks.getUTF8String(i + j)
        if (t == null) hasNull = true
        window(j) = t
        j += 1
      }
      // a window containing a NULL token is SKIPPED, not joined:
      // UTF8String.concatWs silently drops null elements, which would
      // let a window like (a, NULL, b) collide with the genuine shorter
      // ngram "a b" and skew n_distinct/top_count. Skipping keeps
      // `total == sum(counts)`. (The engine's tokenizers never emit
      // null tokens; this defines the contract for caller-built arrays.)
      if (!hasNull) {
        counts.merge(UTF8String.concatWs(sep, window: _*), 1L,
          java.lang.Long.sum)
        total += 1L
      }
      i += 1
    }
    var topCount = 0L
    var topNgram: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topCount ||
          (c == topCount && e.getKey.compareTo(topNgram) < 0)) {
        topCount = c
        topNgram = e.getKey
      }
    }
    InternalRow(total, counts.size.toLong, topCount, topNgram)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "ngram_stats"
}

object TextHashExprs {

  /** THE shingle-window chain, shared by the unweighted
    * ([[ShingleHashesExpr]]) and TF ([[graft.functions.expr
    * .ShingleTfExpr]]) kernels so "what a shingle is" cannot drift
    * between them: per-token XXH64, then the chain over each k-window —
    * with the ngram_stats NULL contract applied uniformly: a window
    * containing a NULL token is SKIPPED (hashing null as anything would
    * collide it with a real token; the engine's tokenizers never emit
    * null tokens — this defines the contract for caller-built arrays).
    * An empty doc, or one where every window was skipped, returns the
    * empty-doc sentinel so downstream MinHash always has input.
    * Non-distinct, window order: callers dedup/RLE as they need.
    */
  private[expr] def shingleWindowHashes(toks: org.apache.spark.sql
      .catalyst.util.ArrayData, k: Int): Array[Long] = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    val nulls = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      if (s == null) nulls(i) = true
      else th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes(), 42L)
      i += 1
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    if (n > 0 && n < k) {
      // degenerate doc: single shingle over all tokens
      var h = 42L
      var j = 0
      var bad = false
      while (j < n) {
        if (nulls(j)) bad = true
        h = XXH64.hashLong(th(j), h); j += 1
      }
      if (!bad) buf += h
    } else if (n >= k) {
      val m = n - k + 1
      var s0 = 0
      while (s0 < m) {
        var h = 42L
        var j = 0
        var bad = false
        while (j < k) {
          val t = s0 + j
          if (nulls(t)) bad = true
          h = XXH64.hashLong(th(t), h); j += 1
        }
        if (!bad) buf += h
        s0 += 1
      }
    }
    if (buf.isEmpty) Array(XXH64.hashLong(0L, 42L)) else buf.toArray
  }

  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      ShingleHashesExpr(ColumnBridge.expression(tokens), k))

  def minhashSignature(hashes: Column, seeds: Array[Long]): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(hashes), seeds))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  def simhash64OfHashes(hashes: Column): Column =
    ColumnBridge.column(SimHashOfHashesExpr(ColumnBridge.expression(hashes)))

  def longSetCount(hashes: Column, set: Array[Long]): Column =
    ColumnBridge.column(
      LongSetCountExpr(ColumnBridge.expression(hashes), set))

  def termCounts(tokens: Column, terms: Array[String]): Column =
    ColumnBridge.column(
      TermCountsExpr(ColumnBridge.expression(tokens), terms))

  def ngramStats(tokens: Column, n: Int): Column =
    ColumnBridge.column(NgramStatsExpr(ColumnBridge.expression(tokens), n))
}
