package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expr.BpeExprs

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016, the
  * GPT-2/LLaMA vocabulary-construction algorithm): repeatedly find the
  * most frequent adjacent symbol pair in the corpus and merge it into a
  * new symbol. [[graft.QueriesExt]] x52 counts the FIRST merge's
  * candidates; this runs the full greedy loop and emits the learned merge
  * table — the artifact a tokenizer ships.
  *
  * Scale shape (the standard trainer decomposition): the corpus collapses
  * ONCE to the distinct-word frequency table — the only corpus-sized
  * shuffle, map-side combined. Every merge round then runs over that
  * vocabulary-sized frame: adjacent pairs explode as (left, right, freq)
  * weighted rows into a combiner-backed sum, and the round's winner is a
  * TakeOrdered(1) — one driver row per round, nothing else leaves the
  * executors. Merge application is a row-local greedy kernel
  * ([[graft.functions.expr.BpeApplyExpr]]) with the chosen pair riding
  * the task binary; each round persists its symbol frame and releases the
  * previous one, so round k reads one vocabulary-table scan, not a
  * k-deep recomputation chain. At 100 TB the word table is Zipf-bounded
  * (hundreds of millions of types, not trillions of tokens) — the loop's
  * cost is K vocabulary scans, independent of corpus token count.
  *
  * Determinism: pair counts are exact longs; the winner is total-ordered
  * by (count DESC, left ASC, right ASC) — binary string order, matching
  * the oracle engine's default collation — and greedy application is
  * leftmost-non-overlapping, so the whole merge table is reproducible
  * cross-engine (the x69 oracle replays all K rounds in unrolled SQL).
  */
object Bpe {

  /** One learned merge: `rank` is 1-based round order, `count` the
    * corpus-weighted frequency of the winning adjacent pair.
    */
  case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** Run `numMerges` greedy merge rounds over the corpus's word-frequency
    * table (whitespace tokens of `lower(textCol)`, matching x52's
    * candidate counting). Stops early if no adjacent pair remains.
    */
  def train(corpus: DataFrame, textCol: String,
      numMerges: Int): Seq[Merge] =
    trainWithVocab(corpus, textCol, numMerges, vocabTopK = 0)._1

  /** [[train]] plus the FINAL symbol-state token histogram — the encoded
    * corpus's vocabulary statistics — harvested from the loop's last
    * persisted frame before release. This is the zero-extra-pass form of
    * `encodeTokens(c, train(c, k))`: the training fold's final state IS
    * the encoding, so the second corpus tokenize+shuffle a separate
    * encode pass would pay never happens. The histogram returns
    * driver-side as the top `vocabTopK` (token, count) rows by
    * (count DESC, token ASC) — bounded like every eager collect here;
    * `vocabTopK = 0` skips the harvest (plain training).
    */
  def trainWithVocab(corpus: DataFrame, textCol: String, numMerges: Int,
      vocabTopK: Int): (Seq[Merge], Seq[(String, Long)]) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val words = graft.Tables.widenForKernel(
        corpus.select(col(textCol)), col(textCol))
      .select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    var syms = words
      .select(col("__f"), BpeExprs.codePointSymbols(col("__w")).as("__s"))
      .persist()
    // the parent of the CURRENT frame, kept persisted until the current
    // frame is materialized by the next round's winner scan (one job per
    // round instead of winner + an explicit materialize count); at most
    // two vocabulary-sized frames are ever live
    var parent: DataFrame = null

    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    try {
      while (rank <= numMerges && !done) {
        val top = syms
          .filter(size(col("__s")) >= 2)
          .select(col("__f"), explode(arrays_zip(
            slice(col("__s"), lit(1), size(col("__s")) - 1),
            slice(col("__s"), lit(2), size(col("__s")) - 1))).as("__p"))
          .select(col("__f"), col("__p.0").as("__l"), col("__p.1").as("__r"))
          .groupBy(col("__l"), col("__r")).agg(sum(col("__f")).as("__c"))
          .orderBy(desc("__c"), asc("__l"), asc("__r"))
          .limit(1).collect()
        // that scan materialized `syms`' persist — its parent can go now
        if (parent != null) { parent.unpersist(); parent = null }
        if (top.isEmpty) done = true
        else {
          val l = top(0).getString(0)
          val r = top(0).getString(1)
          merges += Merge(rank, l, r, top(0).getLong(2))
          val next = syms
            .select(col("__f"), BpeExprs.bpeApply(col("__s"), l, r).as("__s"))
            .persist()
          parent = syms
          syms = next
          rank += 1
        }
      }
      val vocab =
        if (vocabTopK <= 0) Seq.empty[(String, Long)]
        else syms
          .select(col("__f"), explode(col("__s")).as("token"))
          .groupBy(col("token")).agg(sum(col("__f")).as("cnt"))
          .orderBy(desc("cnt"), asc("token")).limit(vocabTopK)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      (merges.result(), vocab)
    } finally {
      if (parent != null) parent.unpersist()
      syms.unpersist()
    }
  }

  /** [[train]] as a DataFrame `(rank, lhs, rhs, cnt)` for the query
    * registry. */
  def trainDf(spark: SparkSession, corpus: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    train(corpus, textCol, numMerges)
      .map(m => (m.rank.toLong, m.lhs, m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "cnt")
  }

  /** Tokenize the corpus with a learned merge table and return the
    * resulting token histogram `(token, cnt)` — counts weighted by word
    * frequency, i.e. the vocabulary statistics of the encoded corpus.
    * Encoding applies the merges in rank order, one greedy leftmost pass
    * each, inside ONE kernel ([[graft.functions.expr.BpeEncodeExpr]]) —
    * exactly the symbol states the training fold visited, so
    * `encodeTokens(c, train(c, k))`'s histogram is the training loop's
    * final state (the x70 oracle replays both from the same SQL rounds).
    *
    * Scale shape: same as training minus the loop — one corpus-sized
    * word-count shuffle, then a vocabulary-sized projection + explode +
    * combiner-backed sum. The merge table rides the task binary.
    */
  def encodeTokens(corpus: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = graft.Tables.widenForKernel(
        corpus.select(col(textCol)), col(textCol))
      .select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    words
      .select(col("__f"),
        graft.functions.expr.BpeExprs.bpeEncode(
          graft.functions.expr.BpeExprs.codePointSymbols(col("__w")),
          merges.sortBy(_.rank).map(m => (m.lhs, m.rhs))).as("__s"))
      .select(col("__f"), explode(col("__s")).as("token"))
      .groupBy(col("token")).agg(sum(col("__f")).as("cnt"))
  }
}
