package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.TextFunctions

/** Sketch tier — mergeable approximate aggregates promoted from spec-only
  * coverage (`ApproxAggSpec`) to oracle-checked registry queries.
  *
  * At 100 TB the exact answers these sketches approximate are the expensive
  * ones: a global `COUNT(DISTINCT)` is a full shuffle of every key, an exact
  * percentile is a global sort, an exact heavy-hitter table is a full
  * token-level aggregation kept forever. The production pattern is to keep a
  * small MERGEABLE sketch per partition/day (HLL for cardinality, KLL/GK for
  * quantiles, count-min for frequencies), and answer queries by merging
  * sketches — O(sketch bytes) per merge instead of O(data) per recount.
  *
  * DuckDB cannot evaluate Spark's sketch binaries, so each query is a LAW
  * query in the style of the ANN recall laws (x12/x13): Spark emits the
  * exact value (which DuckDB replicates) plus booleans asserting the
  * sketch's accuracy contract against that exact value (which DuckDB emits
  * as literal TRUE). The exact side is the verification harness, not the
  * production path — it is the brute-force baseline the sketch replaces.
  * Everything is deterministic (fixed seeds, deterministic sketch
  * implementations), so a green law stays green.
  */
object QueriesSketch {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** x59: HLL cardinality with the sketch-merge law.
    *
    * One aggregation scan builds, per `l_returnflag` slice, BOTH the HLL
    * sketch and the exact distinct `l_partkey` count; the per-slice rows
    * (bounded by the 3-value flag domain) are collected, and the slice
    * sketches are merged with `hll_union_agg` — the operation that makes
    * this the 100 TB pattern: the global estimate comes from the 3 stored
    * sketches, not a re-scan. A second scan computes the exact global
    * distinct count (keys span slices, so it is not derivable from the
    * per-slice exacts) — that scan is the law's brute-force side only.
    * Law: every estimate within 5% of exact (default lgConfigK=12 gives
    * ~1.6% standard error, so 5% is a >3-sigma bound on a deterministic
    * sketch).
    */
  def sketchCardinality(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val li = t(spark, dir, "lineitem")
    // HLL register state is duplicate-insensitive, so the sketch built
    // over the DISTINCT (flag, key) pairs is bit-identical to one built
    // over the raw rows — dedup first and every downstream aggregate
    // (sketch, per-slice exact, global exact) runs over the pair table,
    // whose size is bounded by |flag domain| x |key domain|, not by the
    // fact row count. One map-side-combined shuffle replaces the two
    // full-fact countDistinct expansions this query first shipped with.
    val pairs = li
      .filter(col("l_partkey").isNotNull)
      .select(col("l_returnflag").as("grp"), col("l_partkey"))
      .distinct()
      .persist()
    // per-group AND merged rows in ONE rollup collect: the grand-total
    // grouping set aggregates every pair row into one sketch — identical
    // registers to unioning the per-group sketches (HLL state is
    // register-wise max) — so the merged estimate costs no extra job.
    // Exact per-group counts ride along; the NULL-marked total row
    // carries the merged estimate.
    // the grand-total row is selected by the GROUPING flag, not by a null
    // group value — a genuine NULL group would otherwise masquerade as
    // the total (l_returnflag happens to be non-null in TPC-H, but the
    // query should not depend on that)
    val per = pairs
      .rollup(col("grp"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("est"),
        count(lit(1)).as("exact_nd"),
        grouping(col("grp")).cast("int").as("__total"))
      .collect() // bounded: one row per returnflag value (3) + total
    // the total row's exact_nd counts (grp, key) PAIRS, not distinct keys
    // (a key can appear under several flags) — the global exact distinct
    // still needs its own pass over the pair table
    val globalExact =
      pairs.select(col("l_partkey")).distinct().count()
    pairs.unpersist()
    val totalEst = per.find(_.getInt(3) == 1)
      .getOrElse(sys.error("rollup produced no grand-total row"))
      .getLong(1)
    val rows = per.filter(_.getInt(3) == 0).toSeq.map(r =>
      (r.getString(0), r.getLong(2), r.getLong(1))) :+
      (("__merged__", globalExact, totalEst))
    rows.toSeq.toDF("grp", "exact_nd", "est")
      .select(col("grp"), col("exact_nd"),
        (abs(col("est") - col("exact_nd")) <=
          col("exact_nd") * 0.05).as("within_tol"))
      .orderBy("grp")
  }

  /** x60: approx-percentile with the rank-bracket law.
    *
    * First scan: per-slice `approx_percentile` (Greenwald–Khanna summary,
    * mergeable across partitions) of `l_extendedprice` at p50/p90 with
    * accuracy 1/eps = 10000. Second scan: the verify pass — join the
    * (broadcast, 3-row) thresholds back and count ranks. GK guarantees the
    * returned value's rank is within eps*n of the target rank; the
    * tie-safe bracket is `count(v < a) <= p*n + tol` and
    * `count(v <= a) >= p*n - tol` with tol = eps*n + 1.
    */
  def quantileBracket(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val acc = 10000
    val qs = li.groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n"),
        expr(s"approx_percentile(l_extendedprice, 0.5, $acc)").as("a50"),
        expr(s"approx_percentile(l_extendedprice, 0.9, $acc)").as("a90"))
    val v = li.select(col("l_returnflag").as("grp"),
      col("l_extendedprice").as("v"))
    val tol = col("n") / acc + 1.0
    v.join(broadcast(qs), Seq("grp"))
      .groupBy(col("grp"), col("n"))
      .agg(
        sum(when(col("v") < col("a50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("v") <= col("a50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("v") < col("a90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("v") <= col("a90"), 1L).otherwise(0L)).as("le90"))
      .select(col("grp"), col("n"),
        (col("lt50") <= col("n") * 0.5 + tol &&
          col("le50") >= col("n") * 0.5 - tol).as("p50_ok"),
        (col("lt90") <= col("n") * 0.9 + tol &&
          col("le90") >= col("n") * 0.9 - tol).as("p90_ok"))
      .orderBy("grp")
  }

  /** x61: count-min heavy-hitter frequencies with the one-sided-error law.
    *
    * One scan builds a single count-min sketch over every whitespace token
    * of `documents.text` (eps=1e-4, confidence=0.999, fixed seed —
    * width 20000 x depth 7 longs, ~1 MB, the fixed-size summary that
    * replaces an unbounded token->count table at corpus scale). A second
    * scan computes the exact counts — the law's brute-force side — and
    * takes the deterministic top-20 (count desc, token asc). The 20 probe
    * tokens and the one sketch are collected (both bounded) and probed
    * driver-side. Laws: count-min never underestimates, and stays within
    * eps * totalTokens of exact.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val docs = t(spark, dir, "documents")
    val toks = docs.select(
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val eps = 1e-4
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("n")).persist()
    val top = counts.orderBy(desc("n"), col("tok")).limit(20)
      .collect() // bounded: 20 rows
    val total = counts.agg(sum(col("n"))).head().getLong(0)
    counts.unpersist()
    val skBin = toks
      .agg(expr(s"count_min_sketch(tok, CAST($eps AS DOUBLE), " +
        "CAST(0.999 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0) // bounded: one ~1 MB sketch
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(skBin))
    val slack = math.ceil(eps * total).toLong
    top.toSeq.map { r =>
      val tok = r.getString(0)
      val n = r.getLong(1)
      val est = cms.estimateCount(tok)
      (tok, n, est >= n, est <= n + slack)
    }.toDF("tok", "n", "no_underest", "within_eps")
      .orderBy(desc("n"), col("tok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x59_sketch_cardinality" -> sketchCardinality _,
    "x60_quantile_bracket" -> quantileBracket _,
    "x61_cms_heavy_hitters" -> cmsHeavyHitters _)

  val oracleSql: Map[String, String] = Map(
    "x59_sketch_cardinality" ->
      """SELECT grp, exact_nd, TRUE AS within_tol FROM (
        | SELECT l_returnflag AS grp,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd
        | FROM lineitem GROUP BY 1
        | UNION ALL
        | SELECT '__merged__', CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
        | FROM lineitem)
        |ORDER BY grp""".stripMargin,
    "x60_quantile_bracket" ->
      """SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        | TRUE AS p50_ok, TRUE AS p90_ok
        |FROM lineitem GROUP BY 1 ORDER BY grp""".stripMargin,
    "x61_cms_heavy_hitters" ->
      """SELECT tok, n, TRUE AS no_underest, TRUE AS within_eps FROM (
        | SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents)
        | WHERE length(tok) > 0 GROUP BY 1)
        |ORDER BY n DESC, tok LIMIT 20""".stripMargin)
}
