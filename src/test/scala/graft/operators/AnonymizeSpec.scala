package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  private val qi = Seq("nat", "seg")
  private val ladder = Seq(Seq("seg"), Seq("nat"))

  // planted frame: class (a,x) big enough alone, a's remainder pools at
  // nat level, c's rows can only pool in the all-star class, and the
  // all-star residue is sized to dodge/force suppression per test
  private def planted(extra: Seq[(String, String)]) =
    (Seq.fill(3)(("a", "x")) ++ Seq(("a", "y"), ("a", "z"), ("b", "x")) ++
      extra).zipWithIndex
      .map { case ((n, s), i) => (i.toLong, n, s) }
      .toDF("id", "nat", "seg")

  test("planted ladder: keep, pool at level 1, pool at level 2") {
    // k=3: (a,x) kept at 0; (a,y)+(a,z) pool to (a,*) n=2 < 3 -> fall
    // through with (b,x),(c,x) to the all-star class n=4 >= 3
    val df = planted(Seq(("c", "x")))
    val got = Anonymize.kAnonymize(df, qi, k = 3, ladder)
      .select("id", "nat", "seg", "lvl")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.count(r => r._2 == "a" && r._3 == "x" && r._4 == 0L) == 3)
    assert(got.count(r => r._2 == "*" && r._3 == "*" && r._4 == 2L) == 4)
    assert(got.length == 7)
  }

  test("a pooled class never absorbs rows already kept at a finer level") {
    // k=2: (a,x) n=3 kept at level 0; (a,y),(a,z) pool to (a,*) n=2 at
    // level 1 WITHOUT the (a,x) rows, even though (a,x)'s starred key is
    // also (a,*)
    val df = planted(Nil)
    val audit = Anonymize.audit(df, qi, k = 2, ladder)
      .as[(String, String, Long, Long)].collect().toSet
    assert(audit.contains(("a", "x", 0L, 3L)))
    assert(audit.contains(("a", "*", 1L, 2L)))
    // (b,x) is alone at every pooled nat level -> all-star class of 1 -> n=1
    // < 2 -> suppressed entirely
    assert(!audit.exists(_._1 == "b"))
    val rows = Anonymize.kAnonymize(df, qi, k = 2, ladder)
    assert(rows.count() == 5)
  }

  test("k-anonymity law on real data: every released class has >= k rows, " +
      "suppression accounts for every missing row") {
    val k = 15
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"),
        col("c_nationkey").cast("string").as("nat"),
        col("c_mktsegment").as("seg"))
    val out = Anonymize.kAnonymize(cust, qi, k, ladder).persist()
    val classes = out.groupBy("nat", "seg", "lvl").count()
      .as[(String, String, Long, Long)].collect()
    assert(classes.forall(_._4 >= k), classes.mkString(", "))
    val suppressed = Anonymize.assignments(cust, qi, k, ladder)
      .filter(col("lvl") > ladder.size.toLong)
      .agg(coalesce(sum(col("n0")), lit(0L))).as[Long].head()
    assert(out.count() + suppressed == cust.count())
    // non-QI passthrough: surviving keys are a subset of the input's
    val inKeys = cust.select("c_custkey").as[Long].collect().toSet
    val outKeys = out.select("c_custkey").as[Long].collect()
    assert(outKeys.toSet.subsetOf(inKeys) &&
      outKeys.length == outKeys.toSet.size)
    out.unpersist()
  }

  test("audit equals the row-level release re-aggregated") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_nationkey").cast("string").as("nat"),
        col("c_mktsegment").as("seg"))
    val viaRows = Anonymize.kAnonymize(cust, qi, k = 15, ladder)
      .groupBy("nat", "seg", "lvl").agg(count(lit(1)).as("n"))
      .as[(String, String, Long, Long)].collect().toSet
    val viaAudit = Anonymize.audit(cust, qi, k = 15, ladder)
      .as[(String, String, Long, Long)].collect().toSet
    assert(viaRows == viaAudit)
  }

  test("row side plans broadcast: no shuffle of the data rows") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"),
        col("c_nationkey").cast("string").as("nat"),
        col("c_mktsegment").as("seg"))
    val plan = Anonymize.kAnonymize(cust, qi, k = 15, ladder)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }
}
