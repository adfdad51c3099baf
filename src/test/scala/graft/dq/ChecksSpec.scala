package graft.dq

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    Some("a"), Some("a"), Some("b"), None, Some("c")
  ).toDF("k") // 5 rows: 1 null, 1 duplicate surplus copy of "a"

  test("null rate and dup rate in one pass") {
    val (nullRate, dupRate) = Checks.keyRates(table, "k")
    assert(nullRate == 0.2)
    assert(dupRate == 0.2) // (5 - 1 null - 3 distinct) / 5
  }

  test("orphan rate via anti join") {
    val child = Seq("p1", "p1", "p2", "px").toDF("fk")
    val parent = Seq("p1", "p2", "p3").toDF("pk")
    assert(Checks.orphanRate(child, "fk", parent, "pk") == 0.25)
  }

  test("empty table yields zero rates") {
    val empty = table.limit(0)
    assert(Checks.keyRates(empty, "k") == ((0.0, 0.0)))
    assert(Checks.orphanRate(empty, "k", table, "k") == 0.0)
  }

  test("evaluate thresholds to PASS/FAIL") {
    assert(Checks.evaluate("c", "t", 0.005, 0.01).status == "PASS")
    assert(Checks.evaluate("c", "t", 0.02, 0.01).status == "FAIL")
  }

  test("ledger has the reference 6-column format") {
    val df = Checks.ledger(spark, Seq(Checks.evaluate("c", "t", 0.0, 0.0)))
    assert(df.columns.toSeq == Seq("check_name", "table_name", "metric_value",
      "threshold", "status", "details"))
  }
}
