package graft

/** Every registered query must run on sf0.001 and produce rows (the oracle
  * value check is the driver's t2 gate; locally replicated by
  * tools/check_oracle.py) — and must release every cache it pinned:
  * a query that leaves persisted RDDs behind squats executor storage
  * memory for the rest of a 96-query (or 10⁴-job production) session.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, returns rows, and leaves no cached RDDs") {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      assert(fn(spark, sfDir).count() > 0)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked cached RDDs: $leaked")
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
