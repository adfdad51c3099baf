package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bench-regression gate: the hand-rolled parse of `graft.Bench`'s
  * artifact shape, and the like-for-like gating rules (common queries only,
  * baseline floor, spread-suspect exemption).
  */
class BenchDiffSpec extends AnyFunSuite with Matchers {

  private def art(qs: (String, Double)*)(viol: String*)(contaminated: Boolean = false) = {
    val qsj = qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val vj = viol.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${qs.map(_._2).sum},"unit":"sec","queries":$qsj,""" +
      s""""sf":"/root/testdata/sf0.1","wall_sec":9.9,"gc_sec":0.1,"heap_max_mb":1024,""" +
      s""""max_spread":1.10,"spread_violations":$vj,"spread":{},"attempts":{},""" +
      s""""contaminated":$contaminated}"""
  }

  test("parse extracts queries, violations, contaminated flag from Bench's shape") {
    val a = BenchDiff.parse(art("q01" -> 1.5, "x03" -> 0.76)("x03")(contaminated = true))
    a.queries shouldBe Map("q01" -> 1.5, "x03" -> 0.76)
    a.spreadViolations shouldBe Set("x03")
    a.contaminated shouldBe true
    BenchDiff.parse(art("q01" -> 1.0)()()).contaminated shouldBe false
  }

  test("parse handles scientific notation and empty violation list") {
    val a = BenchDiff.parse(art("q01" -> 1.2e-1)()())
    a.queries("q01") shouldBe 0.12 +- 1e-9
    a.spreadViolations shouldBe empty
  }

  test("parse tolerates whitespace re-serializations (python json.dump " +
      "': ' style) — the round-14 vacuous-gate hole") {
    // the exact shape that silently parsed to ZERO queries: a committed
    // baseline rewritten by a json.dump merge, spaces after ':' and ','
    val respaced =
      """{"metric": "total", "value": 2.26, "unit": "sec", """ +
      """"queries": {"q01": 1.5, "x03": 0.76}, "sf": "s", """ +
      """"spread_violations": ["x03"], "contaminated": true}"""
    val a = BenchDiff.parse(respaced)
    a.queries shouldBe Map("q01" -> 1.5, "x03" -> 0.76)
    a.spreadViolations shouldBe Set("x03")
    a.contaminated shouldBe true
  }

  test("gate fails exactly the >threshold like-for-like regressions") {
    val prev = BenchDiff.parse(art("a" -> 1.0, "b" -> 2.0, "c" -> 1.0)()())
    val curr = BenchDiff.parse(art("a" -> 1.4, "b" -> 3.5, "c" -> 0.9)()())
    val d = BenchDiff.diff(prev, curr, threshold = 1.5)
    d.failures.map(_.name) shouldBe Seq("b") // 1.75x; a is 1.4x, under
    d.ok shouldBe false
  }

  test("sub-floor queries never gate: 3x on a 0.05s query is noise") {
    val prev = BenchDiff.parse(art("tiny" -> 0.05, "big" -> 1.0)()())
    val curr = BenchDiff.parse(art("tiny" -> 0.15, "big" -> 1.1)()())
    BenchDiff.diff(prev, curr).ok shouldBe true
  }

  test("spread-suspect queries (either side) are reported but never fail the gate") {
    val prev = BenchDiff.parse(art("x03" -> 0.8)()())
    val curr = BenchDiff.parse(art("x03" -> 2.5)("x03")())
    val d = BenchDiff.diff(prev, curr)
    d.ok shouldBe true
    d.rows.head.suspect shouldBe true
  }

  test("added and removed queries are surfaced, and only common ones diff") {
    val prev = BenchDiff.parse(art("old" -> 1.0, "both" -> 1.0)()())
    val curr = BenchDiff.parse(art("new" -> 9.0, "both" -> 1.2)()())
    val d = BenchDiff.diff(prev, curr)
    d.added shouldBe Seq("new")
    d.removed shouldBe Seq("old")
    d.rows.map(_.name) shouldBe Seq("both")
    d.ok shouldBe true // "new" at 9s has no baseline, must not fail
  }

  test("r9 scenario: the x42 4.16->6.33 regression is caught at build time") {
    val prev = BenchDiff.parse(art("x42_incremental_dedup" -> 4.16, "x29" -> 3.55)()())
    val curr = BenchDiff.parse(art("x42_incremental_dedup" -> 6.33, "x29" -> 1.54)()())
    val d = BenchDiff.diff(prev, curr)
    d.failures.map(_.name) shouldBe Seq("x42_incremental_dedup")
  }

  private def withCalib(json: String, series: Seq[Double]): String =
    json.dropRight(1) +
      s""","calibration_sec":${series.mkString("[", ",", "]")}}"""

  test("calibration series parses; median and in-run spread computed; " +
      "absent on pre-r17 artifacts") {
    val a = BenchDiff.parse(withCalib(art("q01" -> 1.0)()(),
      Seq(0.50, 0.62, 0.55, 0.54)))
    a.calibration shouldBe Seq(0.50, 0.62, 0.55, 0.54)
    // median and spread are over the IN-SUITE samples (0.62, 0.55, 0.54):
    // the pre-suite 0.50 rides a colder JVM and is not like-positioned
    a.calibrationMedian shouldBe Some(0.55)
    a.calibrationSpread.get shouldBe (0.62 / 0.54) +- 1e-9
    val old = BenchDiff.parse(art("q01" -> 1.0)()())
    old.calibration shouldBe empty
    old.calibrationMedian shouldBe None
    old.calibrationSpread shouldBe None
  }

  test("quiet-host shape: the structural pre-suite-to-in-suite JVM-heat " +
      "step does not read as an in-run degraded phase") {
    // measured quiet-host full-registry shape: pre-suite ~0.55, in-suite
    // plateau ~1.0 (JVM heat). Spread must be computed in-suite only —
    // the old whole-series max/min read 1.0/0.55 = 1.9x and refused to
    // certify exactly the quiet runs the gate exists to certify.
    val a = BenchDiff.parse(withCalib(art("q01" -> 1.0)()(),
      Seq(0.55, 1.00, 0.95, 1.05)))
    a.inSuiteCalibration shouldBe Seq(1.00, 0.95, 1.05)
    a.calibrationSpread.get shouldBe (1.05 / 0.95) +- 1e-9
    a.calibrationSpread.get should be < 1.5
    // a REAL degraded pass still trips the gate via its own sample
    val b = BenchDiff.parse(withCalib(art("q01" -> 1.0)()(),
      Seq(0.55, 1.00, 1.90, 1.05)))
    b.calibrationSpread.get should be > 1.5
    // one-sample series holds ONLY the cold-position pre-suite sample:
    // dropped whole (no median, no spread, no host factor) — using it
    // would compare an unlike-positioned sample against another
    // artifact's in-suite median, the exact ~1.8x skew the split removes
    val c = BenchDiff.parse(withCalib(art("q01" -> 1.0)()(), Seq(0.7)))
    c.inSuiteCalibration shouldBe empty
    c.calibrationMedian shouldBe None
    c.calibrationSpread shouldBe None
  }

  test("host factor normalizes gating: a uniformly 1.4x-slower host does " +
      "not fail the gate, but a real regression on top of it still does") {
    val prev = BenchDiff.parse(withCalib(
      art("a" -> 2.0, "b" -> 3.0)()(), Seq(0.50, 0.50, 0.50)))
    // host 1.4x slower: 'a' merely rides the host (2.0 -> 2.8); 'b'
    // genuinely regressed 1.8x on TOP of the slow host (3.0 -> 7.6)
    val curr = BenchDiff.parse(withCalib(
      art("a" -> 2.8, "b" -> 7.6)()(), Seq(0.70, 0.70, 0.70)))
    val hf = BenchDiff.hostFactor(prev, curr)
    hf shouldBe 1.4 +- 1e-9
    val d = BenchDiff.diff(prev, curr, threshold = 1.5, hostFactor = hf)
    d.failures.map(_.name) shouldBe Seq("b")
  }

  test("host factor only excuses, never tightens (clamped at 1.0 below), " +
      "and caps at 2.0 (past that the caller refuses to certify)") {
    val slow = BenchDiff.parse(withCalib(art("a" -> 1.0)()(),
      Seq(0.8, 1.0, 1.0)))
    val fast = BenchDiff.parse(withCalib(art("a" -> 1.0)()(),
      Seq(0.3, 0.4, 0.4)))
    // current host FASTER than baseline: factor stays 1.0 — a real
    // regression must not hide behind a fast host
    BenchDiff.hostFactor(slow, fast) shouldBe 1.0
    BenchDiff.hostFactor(fast, slow) shouldBe 2.0 // 2.5 capped
    // either side missing calibration: no normalization
    val old = BenchDiff.parse(art("a" -> 1.0)()())
    BenchDiff.hostFactor(old, fast) shouldBe 1.0
    BenchDiff.hostFactor(fast, old) shouldBe 1.0
    // a one-sample series is a cold-position pre-suite sample, not an
    // in-suite median: no normalization off it in either direction
    val one = BenchDiff.parse(withCalib(art("a" -> 1.0)()(), Seq(0.4)))
    BenchDiff.hostFactor(one, slow) shouldBe 1.0
    BenchDiff.hostFactor(slow, one) shouldBe 1.0
  }

  test("calibration_estimator parses and defaults empty on older artifacts") {
    val tagged = BenchDiff.parse(art("a" -> 1.0)()().dropRight(1) +
      ""","calibration_estimator":"min3"}""")
    tagged.calibrationEstimator shouldBe "min3"
    BenchDiff.parse(art("a" -> 1.0)()()).calibrationEstimator shouldBe ""
  }
}
