package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr._

/** SparkSessionExtensions hook: registers the graft native expressions as
  * SQL functions so `spark.sql("SELECT cosine_sim(a, b) ...")` works for
  * SQL-surface users, not just the Column API, and injects the
  * [[graft.plans.RangeJoinRewrite]] optimizer rule (conf-gated by
  * `spark.graft.rangeJoin.binSize`) so naive BETWEEN inequality joins
  * plan as the bucketized range join instead of a nested loop.
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.engine.GraftExtensions
  * }}}
  *
  * This is the (c)-tier Catalyst integration point (SURVEY.md §7.4). No
  * custom physical Strategy is needed: every whole-operator semantic
  * (as-of join, LSH dedup, sessionization) composes into plans Catalyst
  * already picks well, so the tier stops at expressions, function
  * registration, and the one logical rewrite whose naive form Catalyst
  * genuinely cannot save (an inequality-only join is a nested loop
  * without it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0",
      "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(tokens, k) - sorted distinct hashes of word k-grams"),
      (args: Seq[Expression]) => {
        val k = args(1).eval().asInstanceOf[Int]
        ShingleHashesExpr(args.head, k)
      }))

    ext.injectFunction((
      FunctionIdentifier("l2_normalize"),
      info("l2_normalize",
        "l2_normalize(vec) - unit-normalize a float/double array"),
      (args: Seq[Expression]) => L2NormalizeExpr(args.head)))

    ext.injectFunction((
      FunctionIdentifier("lang_id_trigram"),
      info("lang_id_trigram",
        "lang_id_trigram(text) - trigram-profile language code or 'und'"),
      (args: Seq[Expression]) => TrigramLangIdExpr(args.head)))

    ext.injectFunction((
      FunctionIdentifier("shingle_tf"),
      info("shingle_tf",
        "shingle_tf(tokens, k) - struct(hashes, weights) term-frequency " +
          "view of the word k-gram bag"),
      (args: Seq[Expression]) => {
        val k = args(1).eval().asInstanceOf[Int]
        ShingleTfExpr(args.head, k)
      }))

    ext.injectFunction((
      FunctionIdentifier("weighted_jaccard"),
      info("weighted_jaccard",
        "weighted_jaccard(hashesA, weightsA, hashesB, weightsB) - exact " +
          "sum-min/sum-max similarity of two sparse weight vectors"),
      (args: Seq[Expression]) => WeightedJaccardExpr(args)))

    ext.injectFunction((
      FunctionIdentifier("long_set_count"),
      info("long_set_count",
        "long_set_count(hashes, set) - count of array<bigint> elements " +
          "present in a constant bigint array (broadcast-set probe)"),
      (args: Seq[Expression]) => {
        val set = args(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toLongArray()
          case other => throw new IllegalArgumentException(
            s"long_set_count: second argument must be a constant " +
              s"array<bigint>, got $other")
        }
        LongSetCountExpr(args.head, set)
      }))

    ext.injectFunction((
      FunctionIdentifier("ewma_scan"),
      info("ewma_scan",
        "ewma_scan(series, alpha) - running exponentially-weighted " +
          "moving average over an ordered array<double>"),
      (args: Seq[Expression]) => {
        val alpha = args(1).eval() match {
          case d: java.lang.Double => d.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case f: java.lang.Float => f.doubleValue()
          case other => throw new IllegalArgumentException(
            s"ewma_scan: alpha must be a constant number, got $other")
        }
        EwmaScanExpr(args.head, alpha)
      }))

    ext.injectFunction((
      FunctionIdentifier("term_counts"),
      info("term_counts",
        "term_counts(tokens, terms) - per-term occurrence counts of an " +
          "array<string> against a constant term list"),
      (args: Seq[Expression]) => {
        val terms = args(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toArray[org.apache.spark.unsafe.types.UTF8String](
              org.apache.spark.sql.types.StringType).map(_.toString)
          case other => throw new IllegalArgumentException(
            s"term_counts: second argument must be a constant " +
              s"array<string>, got $other")
        }
        TermCountsExpr(args.head, terms)
      }))

    // optimizer tier: the conf-gated range-join rewrite (see
    // graft.plans.RangeJoinRewrite) — naive BETWEEN inequality joins plan
    // as the bucketized equi-join instead of a BroadcastNestedLoopJoin
    // once spark.graft.rangeJoin.binSize is set
    ext.injectOptimizerRule(session =>
      graft.plans.RangeJoinRewrite(session))
  }
}
