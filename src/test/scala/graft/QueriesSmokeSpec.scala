package graft

/** Every registered query must run on sf0.001 and produce rows (the oracle
  * value check is the driver's t2 gate; locally replicated by
  * tools/check_oracle.py).
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
