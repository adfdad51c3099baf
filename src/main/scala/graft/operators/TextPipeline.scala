package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-preparation transforms a training-data pipeline runs between
  * filtering and tokenization: fixed-size token-window chunking (context
  * packing), benchmark decontamination (GPT-3 appendix C / Brown et al.
  * 2020-style 13-gram overlap), and PII redaction. All three are
  * row-local or broadcast-joined — no corpus-sized shuffle anywhere, so
  * they scale linearly with input bytes at 100 TB.
  */
object TextPipeline {

  /** Split each document into overlapping token windows of `chunkSize`
    * tokens with `overlap` tokens shared between consecutive windows —
    * the training-window packing step. Window starts advance by
    * `chunkSize - overlap`; the final window may be shorter (it keeps the
    * tail). A doc with <= `chunkSize` tokens yields exactly one window.
    *
    * Pure per-row computation (tokenize + HOF slices + posexplode): no
    * shuffle, fully codegen-compatible, output rows ≈ input tokens /
    * stride.
    */
  /** Window count for a doc of `nTokens` tokens under
    * [[chunkByTokens]]'s layout — THE shared expression both the chunker
    * and [[chunkCount]] evaluate, so the two can never drift: starts
    * advance by `chunkSize - overlap` and a doc of <= `chunkSize` tokens
    * (including an empty one) yields exactly one window.
    */
  private def nChunksExpr(nTokens: Column, chunkSize: Int,
      overlap: Int): Column = {
    val stride = chunkSize - overlap
    when(nTokens <= chunkSize, lit(1))
      .otherwise(floor((nTokens - chunkSize + stride - 1)
        .cast("double") / stride).cast("int") + 1)
  }

  /** Row-local chunk count: how many windows [[chunkByTokens]] emits for
    * a doc whose token count is `nTokens` — `sum(chunkCount(...))` over a
    * corpus equals `chunkByTokens(...).count()` by construction (the
    * chunker posexplodes an array of exactly this length), for the price
    * of an arithmetic projection instead of the full window explode.
    * For funnels that need the chunk VOLUME, not the chunks.
    */
  def chunkCount(nTokens: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    nChunksExpr(nTokens, chunkSize, overlap).cast("long")
  }

  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    // tokensOf: textCol may be raw text or a shared pre-tokenized array
    val toks = TextFunctions.tokensOf(df, textCol)
    val n = size(toks)
    // windows: starts 1, 1+stride, ... ; count = 1 + ceil((n-chunkSize)/stride)
    val nChunks = nChunksExpr(n, chunkSize, overlap)
    df.select(col(idCol), toks.as("__t"), nChunks.as("__k"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__k") - 1),
          k => slice(col("__t"), k * stride + 1, lit(chunkSize))))
          .as(Seq("chunk_id", "__w")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__w")).as("chunk_text"))
  }

  /** Flag corpus documents sharing token `n`-grams with a benchmark set —
    * test-set decontamination (the 13-gram rule of GPT-3's appendix C;
    * RefinedWeb and The Pile run the same shape). A document with >=
    * `minHits` distinct shared n-grams is contaminated and should be
    * dropped before training.
    *
    * Scale shape: the benchmark n-gram set is small by definition
    * (benchmarks are thousands of documents, not billions). When its
    * DISTINCT hash set fits `maxSetNgrams` (default 4M entries = 32 MB,
    * well inside task-binary broadcast territory) it is collected once and
    * probed per document by a native set-membership expression
    * ([[graft.functions.expr.LongSetCountExpr]]) — the whole stage is ONE
    * corpus projection: no per-n-gram `posexplode` (the only corpus-wide
    * row expansion this stage otherwise has), no join, no count aggregate,
    * no second corpus pass for the zero-hit left join. A benchmark too big
    * for the bound falls back to the equivalent explode + broadcast-join +
    * count shape, which never materializes the set on the driver. Either
    * way the corpus never shuffles text — n-grams ride as 8-byte xxhash64
    * values ([[Dedup.shingleHashes]]'s native expression): documents
    * shorter than `n` tokens hash as one whole-document shingle, so short
    * benchmark docs still decontaminate their exact copies.
    */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13,
      minHits: Int = 1, maxSetNgrams: Int = 4 << 20): DataFrame = {
    contaminationHits(corpus, benchmark, textCol, n, maxSetNgrams) match {
      case Some(hits) =>
        // two-step select: n_hits references the shingle kernel once;
        // CollapseProject keeps non-cheap expressions single-evaluation, so
        // `contaminated` reuses the count instead of re-running the kernel
        corpus
          .select(col(idCol), hits.as("n_hits"))
          .select(col(idCol), col("n_hits"),
            (col("n_hits") >= minHits).as("contaminated"))
      case None => flagContaminatedJoin(corpus, benchmark, textCol, idCol,
        n, minHits)
    }
  }

  /** Per-document banned-phrase audit: `(all input columns, n_banned)`
    * where `n_banned` counts the DISTINCT `phrases` occurring as
    * substrings of `textCol` — policy lexicons, license-boilerplate
    * markers, blocklists. One Aho-Corasick automaton pass per document
    * ([[graft.functions.expr.MultiPatternHitCountExpr]]): O(|doc|)
    * independent of lexicon size, where per-phrase `contains` scans the
    * corpus |phrases| times; the lexicon rides the task binary. Filter
    * on `n_banned` for the drop policy.
    */
  def flagBannedPhrases(corpus: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame =
    corpus.withColumn("n_banned",
      graft.functions.expr.MultiPatternExprs.multiPatternHits(
        col(textCol), phrases))

  /** The per-document contamination hit count as a fusable COLUMN —
    * `Some(column)` counting benchmark `n`-grams in `textCol`, or `None`
    * when the benchmark's distinct n-gram set exceeds `maxSetNgrams` (then
    * only [[flagContaminated]]'s join shape applies). Because the count
    * depends ONLY on the document and the benchmark set, a pipeline can
    * evaluate it in an EARLIER stage's projection (e.g. alongside quality
    * signals in the first corpus pass) and apply the decontamination
    * filter later as a cached-column predicate — no dedicated decontam
    * scan or join. EAGER: collects the (small by definition) benchmark
    * set, bounded to 8(maxSetNgrams+1) driver bytes by limit-probing.
    */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, n: Int = 13,
      maxSetNgrams: Int = 4 << 20): Option[Column] = {
    // shinglesOf: textCol may be raw text or a shared pre-tokenized array
    val bh = benchmark
      .select(explode(Dedup.shinglesOf(benchmark, textCol, n)).as("__h"))
      .distinct()
    // bounded probe: limit(max+1) caps driver memory at 8(max+1) bytes and
    // answers "does it fit" in the same job that fetches the set
    val probe = bh.limit(maxSetNgrams + 1).collect()
    if (probe.length <= maxSetNgrams)
      Some(graft.functions.expr.TextHashExprs.longSetCount(
        Dedup.shinglesOf(corpus, textCol, n), probe.map(_.getLong(0))))
    else None
  }

  private def flagContaminatedJoin(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int, minHits: Int): DataFrame = {
    val bh = benchmark
      .select(explode(Dedup.shinglesOf(benchmark, textCol, n)).as("__h"))
      .distinct()
    val hits = corpus
      .select(col(idCol), explode(Dedup.shinglesOf(corpus, textCol, n))
        .as("__h"))
      .join(broadcast(bh), Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nh"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nh"), lit(0L)).as("n_hits"),
        (coalesce(col("__nh"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** Duplicated-span occurrences: every `k`-token window of every doc,
    * hashed, ranked within its hash by (doc, position). Rank 1 is the
    * CANONICAL occurrence; every later occurrence of the same window —
    * across docs or repeated within one doc — is a duplicated span whose
    * tokens should not be trained on again (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": exact
    * substring dedup; fixed-k window hashing is its scalable shape —
    * any duplicated run >= k tokens is covered by duplicated windows).
    *
    * Scale shape: the occurrence stream carries (8-byte window hash, id,
    * position) — never text; the marked-token explode is bounded by
    * duplicated occurrences x k, which the dup rate, not the corpus,
    * determines. Canonical selection is a two-phase aggregate-min + join,
    * NOT a `row_number` window: a window over the hash would funnel every
    * occurrence of one hot window (a boilerplate 20-token run repeated
    * 10^8 times in a 100 TB corpus) into a single sort task. The
    * `min(struct(id, pos))` hash-aggregate map-side-combines a hot hash to
    * one row per map partition, and the probe join back onto the
    * occurrence stream is AQE-skew-splittable — no operator in the plan
    * ever needs all occurrences of one hash in one task.
    */
  private def markedDuplicateTokens(df: DataFrame, textCol: String,
      idCol: String, k: Int): (DataFrame, DataFrame) = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
    val occ = base.filter(col("__n") >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("__n") - k),
        i => xxhash64(concat_ws(" ", slice(col("__t"), i + 1, lit(k))))))
        .as(Seq("__pos", "__g")))
    // global canonical occurrence per window hash = min(id, pos); windows
    // seen once mark nothing and drop out of the probe side's build input
    val canon = occ
      .groupBy(col("__g"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__c"),
        count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .select(col("__g"), col("__c"))
    // 1-based token positions covered by a non-canonical occurrence
    val marked = occ.join(canon, Seq("__g"))
      .filter(struct(col(idCol), col("__pos")) =!= col("__c"))
      .select(col(idCol),
        explode(sequence(col("__pos") + 1, col("__pos") + k))
          .as("__tokpos"))
      .distinct()
    (base, marked)
  }

  /** Per-doc duplicated-substring statistics: token count, tokens covered
    * by non-canonical duplicated `k`-windows, and surviving tokens.
    */
  def duplicatedSpanStats(df: DataFrame, textCol: String, idCol: String,
      k: Int = 20): DataFrame = {
    val (base, marked) = markedDuplicateTokens(df, textCol, idCol, k)
    val drops = marked.groupBy(col(idCol)).agg(count(lit(1)).as("__nd"))
    base.select(col(idCol), col("__n"))
      .join(drops, Seq(idCol), "left")
      .select(col(idCol), col("__n").as("n_tokens"),
        coalesce(col("__nd"), lit(0L)).as("n_dropped"),
        (col("__n") - coalesce(col("__nd"), lit(0L))).as("n_kept"))
  }

  /** Remove duplicated spans: rebuild each doc's text from the tokens NOT
    * covered by a non-canonical duplicated window — one global copy of
    * every >= `k`-token duplicated run survives (in its canonical doc).
    */
  def dropDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      k: Int = 20): DataFrame = {
    val (base, marked) = markedDuplicateTokens(df, textCol, idCol, k)
    val lists = marked.groupBy(col(idCol))
      .agg(collect_list(col("__tokpos")).as("__mk"))
    // the marked positions become a per-row HASH MAP, built once per row
    // in its own projection (inlining it into the filter lambda would
    // rebuild it per ELEMENT): the rebuild is then O(tokens + marked)
    // per doc where the array_contains scan it replaces was
    // O(tokens x marked) — quadratic exactly on the heavily-duplicated
    // docs this operator targets
    val mk = coalesce(col("__mk"), array().cast("array<bigint>"))
    base.join(lists, Seq(idCol), "left")
      .select(col(idCol), col("__t"),
        map_from_arrays(mk, transform(mk, _ => lit(true))).as("__mask"))
      .select(col(idCol),
        concat_ws(" ", filter(col("__t"),
          (_, i) => !map_contains_key(col("__mask"),
            i.cast("long") + 1L))).as(textCol))
  }

  /** Greedy sequence packing: assign chunks to training sequences of at
    * most `capacity` tokens, next-fit in id order WITHIN each partition —
    * the padding-minimization step between chunking and batch assembly.
    * Packing is inherently sequential, so it runs per partition inside
    * `mapPartitions` (bin ids are globally unique via the partition index
    * in the high bits); cross-partition "waste" is at most one underfull
    * bin per partition, negligible when partitions hold millions of
    * chunks. A chunk larger than `capacity` gets its own bin rather than
    * failing the job.
    *
    * Output: input columns + `bin_id` + `bin_fill` (the bin's final token
    * total, repeated on each member row).
    *
    * Memory shape: the iterator buffers ONE bin at a time — at most
    * `capacity / min-chunk-tokens` rows (or a single oversize chunk) —
    * never the partition's whole output. Post-chunking partitions are the
    * largest in the pipeline; buffering them wholesale (the naive
    * `ArrayBuffer`-then-iterator shape) is heap ∝ partition size and dies
    * exactly where the data is biggest.
    */
  def packChunks(df: DataFrame, tokenCountCol: String, idCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    import org.apache.spark.sql.{Encoders, Row}
    val sorted = df.repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
    val outSchema = sorted.schema
      .add("bin_id", org.apache.spark.sql.types.LongType)
      .add("bin_fill", org.apache.spark.sql.types.LongType)
    val enc = Encoders.row(outSchema)
    val nIdx = sorted.schema.fieldIndex(tokenCountCol)
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      packIterator(it, nIdx, capacity, pid)
    }(enc)
  }

  /** Lazy next-fit bin packer over one partition's row stream: pulls rows
    * until the current bin closes (next row would overflow `capacity`),
    * emits that bin's rows stamped with (bin_id, bin_fill), then pulls the
    * next bin. Only the open bin is ever buffered.
    */
  private[operators] def packIterator(it: Iterator[org.apache.spark.sql.Row],
      nIdx: Int, capacity: Long, pid: Long)
      : Iterator[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.Row
    def tokensOf(r: Row): Long = r.get(nIdx) match {
      case l: Long => l
      case i: Int => i.toLong
    }
    new Iterator[Row] {
      private var bin = 0L
      private var pending: Row = null // overflow row: starts the next bin
      private var emit: Iterator[Row] = Iterator.empty
      private def fillNextBin(): Unit = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        var fill = 0L
        if (pending != null) {
          buf += pending; fill = tokensOf(pending); pending = null
        }
        var closed = false
        while (!closed && it.hasNext) {
          val r = it.next()
          val n = tokensOf(r)
          if (fill > 0 && fill + n > capacity) { pending = r; closed = true }
          else { buf += r; fill += n }
        }
        val id = (pid << 40) | bin
        bin += 1
        val f = fill
        emit = buf.iterator.map(r => Row.fromSeq(r.toSeq :+ id :+ f))
      }
      def hasNext: Boolean = {
        while (!emit.hasNext && (pending != null || it.hasNext)) fillNextBin()
        emit.hasNext
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("empty packing")
        emit.next()
      }
    }
  }

  /** Redact common PII surface forms: emails, NNN-NNN-NNNN phone numbers,
    * dotted-quad IPs — replaced by typed placeholder tags. Order matters:
    * emails first (their local parts can contain digits and dots), then
    * phones, then IPs. ASCII patterns only, portable across regex engines
    * (Java here, RE2-class engines elsewhere); one codegen'd
    * regexp_replace chain, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
}
