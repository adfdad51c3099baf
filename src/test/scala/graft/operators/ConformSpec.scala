package graft.operators

import graft.SparkSpec

class ConformSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    ("f1", "c1"), ("f2", "c2"), ("f3", "c9"), ("f4", null)
  ).toDF("fact_id", "cust_fk")

  private def dim = Seq(("c1", "A"), ("c2", "B")).toDF("cust_id", "name")

  test("NullPolicy.DropRow removes null rows") {
    val out = NullPolicy(facts, "cust_fk", NullPolicy.DropRow)
    assert(out.count() == 3)
  }

  test("NullPolicy.Default substitutes") {
    val out = NullPolicy(facts, "cust_fk", NullPolicy.Default("c0"))
      .filter($"fact_id" === "f4").head().getString(1)
    assert(out == "c0")
  }

  test("NullPolicy.ToUnknown maps to unknown key") {
    val out = NullPolicy(facts, "cust_fk", NullPolicy.ToUnknown("-1"))
      .filter($"fact_id" === "f4").head().getString(1)
    assert(out == "-1")
  }

  test("OrphanPolicy.MapToUnknown patches dangling FKs only") {
    val out = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.MapToUnknown("-1"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("f1") == "c1")
    assert(out("f3") == "-1") // dangling
    assert(out("f4") == "-1") // null key also misses the probe
  }

  test("OrphanPolicy.KeepDangling passes dangling FKs through") {
    val out = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.KeepDangling)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("f3").contains("c9"))
    assert(out("f4").isEmpty) // null stays null (patched separately upstream)
    assert(out.size == 4)
  }

  test("OrphanPolicy.Reject drops orphans and null keys") {
    val out = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.Reject)
    assert(out.select("fact_id").as[String].collect().toSet == Set("f1", "f2"))
  }

  test("non-broadcast conform path produces identical results") {
    val a = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.MapToUnknown("-1"), broadcastDim = true)
      .collect().map(_.toSeq).toSet
    val b = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.MapToUnknown("-1"), broadcastDim = false)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("withUnknownMember appends typed UNKNOWN row") {
    val d = Seq((1L, "x")).toDF("k", "v")
    val out = Conform.withUnknownMember(d, "k", unknownKey = -1L)
    assert(out.count() == 2)
    val unk = out.filter($"k" === -1L).head()
    assert(unk.getString(1) == "UNKNOWN")
  }

  test("orphan rate is zero after MapToUnknown conformance w.r.t. dim+unknown") {
    val conformed = Conform.fact(facts, "cust_fk", dim, "cust_id",
      OrphanPolicy.MapToUnknown("-1"))
    val dimWithUnknown = Conform.withUnknownMember(
      dim.withColumnRenamed("cust_id", "k"), "k", unknownKey = "-1")
    val rate = graft.dq.Checks.orphanRate(conformed, "cust_fk",
      dimWithUnknown, "k")
    assert(rate == 0.0)
  }
}
