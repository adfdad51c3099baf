package graft.tools

import scala.io.Source

/** Mechanical per-query bench regression gate.
  *
  * Diffs two bench artifacts (the one-line JSON `graft.Bench` emits, e.g.
  * `BENCH_LOCAL_r8.json` vs `target/bench.json`) query-by-query and exits
  * non-zero when any like-for-like query regressed beyond a threshold.
  * Exists because regressions otherwise surface only via judge archaeology a
  * round later (r9: x42 went 4.16→6.33 s and nothing at build time noticed).
  *
  * Comparison rules:
  *   - only queries present in BOTH artifacts count (new queries are listed
  *     informationally, never failed — there is no "like-for-like" baseline);
  *   - queries faster than `minSec` in the baseline are ignored for the gate
  *     (sub-0.2 s timings are scheduler noise, a 2x swing there is meaningless);
  *   - a query flagged as a spread violation in EITHER artifact is reported
  *     but does not fail the gate — its number is already self-flagged as
  *     unconfirmed, failing on it would punish host contention, not code.
  *
  * Usage: tools/run.sh graft.tools.BenchDiff BENCH_LOCAL_r8.json target/bench.json [threshold]
  */
object BenchDiff {

  /** One artifact's relevant fields. Parsing is hand-rolled against the flat
    * shape `Bench` emits (no JSON lib on the classpath by design); it is NOT
    * a general JSON parser and `BenchDiffSpec` pins the exact shape.
    */
  final case class BenchArtifact(
      queries: Map[String, Double],
      spreadViolations: Set[String],
      contaminated: Boolean,
      calibration: Seq[Double] = Nil,
      calibrationEstimator: String = "") {
    /** The per-pass (IN-SUITE) probe samples: everything after the
      * pre-suite sample. Probe samples are position-sensitive — the
      * pre-suite sample rides a cold-ish JVM while in-suite samples pay
      * the code-cache/profile pollution of a hot one (measured: a QUIET
      * host probes 0.5-0.6s pre-suite and 0.8-1.1s between passes of the
      * full registry, a structural ~1.8x step that is JVM heat, not host
      * drift) — so spread and cross-artifact medians compare only
      * like-positioned samples. A one-sample series holds ONLY the
      * cold-position pre-suite sample, so it is dropped (empty — treated
      * like a pre-probe artifact): using it would compare an
      * unlike-positioned sample against another artifact's in-suite
      * median, the exact ~1.8x skew this split exists to remove.
      */
    def inSuiteCalibration: Seq[Double] =
      if (calibration.size >= 2) calibration.drop(1) else Nil
    /** Median of the in-suite probe samples — the in-artifact record of
      * how fast the HOST was while the queries actually ran. Empty for
      * pre-r17 artifacts.
      */
    def calibrationMedian: Option[Double] = {
      val s = inSuiteCalibration
      if (s.isEmpty) None else Some(s.sorted.apply(s.size / 2))
    }
    /** max/min of the in-suite probe series: >1.5 means the host changed
      * speed DURING the run (a degraded phase), so per-query numbers are
      * not comparable even to each other. The pre-suite sample is
      * excluded (see [[inSuiteCalibration]]): on a quiet host it is
      * structurally ~1.8x BELOW the in-suite plateau, which would read
      * as a phantom in-run phase on exactly the runs this gate exists to
      * certify — while a genuinely degraded pass still shows in its own
      * bracketing per-pass sample.
      */
    def calibrationSpread: Option[Double] = {
      val s = inSuiteCalibration
      if (s.size < 2) None
      else Some(s.max / s.min.max(1e-9))
    }
  }

  // whitespace-tolerant around ':' — Bench emits compact JSON, but a
  // committed baseline re-serialized by another tool (e.g. a Python
  // json.dump merge, which writes ": ") must still parse: round 14 found
  // the strict form silently reading ZERO queries from such a baseline,
  // making the gate pass vacuously ("every query is new")
  private val NumField =
    """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.eE+]+)""".r

  /** Extract the object literal following `"<key>":` assuming no nested
    * braces inside (true for Bench's flat maps).
    */
  private def objectBody(json: String, key: String): String = {
    val start = """"%s"\s*:\s*\{""".format(key).r
      .findFirstMatchIn(json).map(_.start).getOrElse(-1)
    if (start < 0) return ""
    val open = json.indexOf('{', start)
    val close = json.indexOf('}', open)
    if (close < 0) "" else json.substring(open + 1, close)
  }

  def parse(json: String): BenchArtifact = {
    val qs = NumField.findAllMatchIn(objectBody(json, "queries"))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val viol = {
      val start = """"spread_violations"\s*:\s*\[""".r
        .findFirstMatchIn(json).map(_.start).getOrElse(-1)
      if (start < 0) Set.empty[String]
      else {
        val open = json.indexOf('[', start)
        val close = json.indexOf(']', open)
        """"([^"]+)"""".r.findAllMatchIn(json.substring(open + 1, close))
          .map(_.group(1)).toSet
      }
    }
    val calib = {
      val start = """"calibration_sec"\s*:\s*\[""".r
        .findFirstMatchIn(json).map(_.start).getOrElse(-1)
      if (start < 0) Nil
      else {
        val open = json.indexOf('[', start)
        val close = json.indexOf(']', open)
        """-?[0-9.eE+]+""".r
          .findAllIn(json.substring(open + 1, close)).map(_.toDouble).toSeq
      }
    }
    val estimator =
      """"calibration_estimator"\s*:\s*"([^"]*)"""".r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    BenchArtifact(qs, viol,
      """"contaminated"\s*:\s*true""".r.findFirstIn(json).isDefined, calib,
      estimator)
  }

  final case class Row(name: String, prev: Double, curr: Double,
      ratio: Double, gated: Boolean, suspect: Boolean)

  final case class Diff(rows: Seq[Row], added: Seq[String], removed: Seq[String],
      failures: Seq[Row]) {
    def ok: Boolean = failures.isEmpty
  }

  /** Host speed factor between two artifacts, from their calibration
    * series: >1 means the CURRENT run's host was slower. 1.0 when either
    * side predates the calibration probe. Clamped to [1, 2]: the factor
    * only ever EXCUSES apparent regressions on a slower host (never
    * tightens the gate on a faster one — a real regression must not hide
    * behind a fast host), and past 2x the host is too degraded to
    * certify at all (the caller refuses instead of normalizing).
    */
  def hostFactor(prev: BenchArtifact, curr: BenchArtifact): Double =
    (for (p <- prev.calibrationMedian; c <- curr.calibrationMedian)
      yield (c / p).max(1.0).min(2.0)).getOrElse(1.0)

  /** Pure diff logic, spec-covered. `threshold` is the like-for-like
    * regression ratio that fails the gate; `minSec` the baseline floor below
    * which a query is too fast to gate on; `hostFactor` divides current
    * timings before gating (calibration-normalized comparison).
    */
  def diff(prev: BenchArtifact, curr: BenchArtifact,
      threshold: Double = 1.5, minSec: Double = 0.2,
      hostFactor: Double = 1.0): Diff = {
    val common = prev.queries.keySet intersect curr.queries.keySet
    val suspects = prev.spreadViolations ++ curr.spreadViolations
    val rows = common.toSeq.sorted.map { n =>
      val (p, c) = (prev.queries(n), curr.queries(n))
      val ratio = if (p > 0) c / hostFactor / p else Double.PositiveInfinity
      val suspect = suspects.contains(n)
      Row(n, p, c, ratio, gated = p >= minSec && !suspect, suspect)
    }
    Diff(
      rows = rows,
      added = (curr.queries.keySet -- prev.queries.keySet).toSeq.sorted,
      removed = (prev.queries.keySet -- curr.queries.keySet).toSeq.sorted,
      failures = rows.filter(r => r.gated && r.ratio > threshold))
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    if (args.length < 2) {
      System.err.println("usage: BenchDiff <prev.json> <curr.json> [threshold]")
      sys.exit(2)
    }
    def load(p: String) = {
      val src = Source.fromFile(p); try parse(src.mkString) finally src.close()
    }
    val (prev, curr) = (load(args(0)), load(args(1)))
    // an empty side means the artifact did not parse, not that there is
    // nothing to compare — a vacuous "everything is new" pass IS a gate
    // hole (round 14: a respaced baseline parsed to zero queries)
    for ((side, a) <- Seq(args(0) -> prev, args(1) -> curr)
        if a.queries.isEmpty) {
      System.err.println(s"FAIL: no queries parsed from $side — " +
        "not a graft.Bench artifact (or an unsupported re-serialization)")
      sys.exit(2)
    }
    val threshold = args.lift(2).map(_.toDouble).getOrElse(1.5)
    // in-run host health: a probe series that moved >1.5x WITHIN the run
    // means a degraded phase hit some queries and not others — no global
    // factor can repair that artifact; refuse to certify it
    for (spread <- curr.calibrationSpread if spread > 1.5) {
      System.err.println(f"FAIL: host speed changed ${spread}%.2fx DURING " +
        "the current run (calibration series " +
        s"${curr.calibration.map(c => f"$c%.2f").mkString(",")}) — " +
        "artifact not certifiable, re-run on a quieter host")
      sys.exit(3)
    }
    // estimator provenance: a min-of-3 series point sits systematically
    // BELOW a single-sample point (by up to the probe's ±40% noise), so
    // a host factor across mixed-estimator artifacts is biased toward
    // 1.0 — stricter gate, phantom regressions possible. Warn, don't
    // fail: the per-query gate still holds, only the normalization is
    // conservative.
    if (prev.calibrationEstimator != curr.calibrationEstimator &&
        prev.calibrationMedian.nonEmpty && curr.calibrationMedian.nonEmpty)
      println("NOTE: calibration estimators differ (prev '" +
        s"${if (prev.calibrationEstimator.isEmpty) "single"
            else prev.calibrationEstimator}' vs curr '" +
        s"${if (curr.calibrationEstimator.isEmpty) "single"
            else curr.calibrationEstimator}') — host-factor " +
        "normalization is biased toward 1.0 (stricter gate); prefer a " +
        "same-estimator baseline")
    val hf = hostFactor(prev, curr)
    if (hf > 1.0)
      println(f"host calibration: current run ${hf}%.2fx slower " +
        f"(prev median ${prev.calibrationMedian.getOrElse(0.0)}%.2fs, " +
        f"curr ${curr.calibrationMedian.getOrElse(0.0)}%.2fs) — " +
        "gating on calibration-normalized ratios")
    val d = diff(prev, curr, threshold, hostFactor = hf)
    val interesting = d.rows.filter(r => r.ratio > 1.2 || r.ratio < 0.8)
    println(f"${"query"}%-28s ${"prev"}%8s ${"curr"}%8s ${"ratio"}%7s")
    for (r <- d.rows) {
      val flag =
        if (r.gated && r.ratio > threshold) " REGRESSION"
        else if (r.suspect) " (spread-suspect)"
        else if (!r.gated) " (below floor)"
        else ""
      if (interesting.contains(r) || flag.contains("REGRESSION"))
        println(f"${r.name}%-28s ${r.prev}%8.2f ${r.curr}%8.2f ${r.ratio}%7.2f$flag")
    }
    if (d.added.nonEmpty) println(s"new queries (not gated): ${d.added.mkString(", ")}")
    if (d.removed.nonEmpty) println(s"removed queries: ${d.removed.mkString(", ")}")
    val pTot = d.rows.map(_.prev).sum
    val cTot = d.rows.map(_.curr).sum
    println(f"like-for-like total: prev $pTot%.1fs curr $cTot%.1fs (${cTot / pTot}%.2fx)")
    if (curr.contaminated)
      println("NOTE: current artifact self-flags contaminated:true — rerun on a quiet host")
    if (!d.ok) {
      System.err.println(s"FAIL: ${d.failures.size} quer${if (d.failures.size == 1) "y" else "ies"} " +
        s"regressed >${threshold}x like-for-like: ${d.failures.map(_.name).mkString(", ")}")
      sys.exit(1)
    }
    println(s"OK: no like-for-like regression >${threshold}x")
  }
}
