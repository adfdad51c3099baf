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
}
