package graft.operators

import graft.SparkSpec

class DedupLatestSpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    ("k1", "2024-01-01", "old"),
    ("k1", "2024-06-01", "new"),
    ("k2", "2024-03-03", "only"),
    ("k3", "2024-02-02", "tie-a"),
    ("k3", "2024-02-02", "tie-b")
  ).toDF("id", "ts", "payload")

  test("keeps the latest record per key") {
    val out = DedupLatest(dirty, Seq("id"), "ts").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(out("k1") == "new")
    assert(out("k2") == "only")
    assert(out.size == 3)
  }

  test("tie on order column resolves deterministically") {
    val runs = (1 to 3).map { _ =>
      DedupLatest(dirty, Seq("id"), "ts", extraTiebreak = Seq("payload"))
        .filter($"id" === "k3").collect().head.getString(2)
    }
    assert(runs.distinct.size == 1)
    assert(runs.head == "tie-b") // desc order on payload tiebreak
  }

  test("viaAggregate matches window formulation on tie-free data") {
    val tieFree = dirty.filter($"payload" =!= "tie-b")
    val a = DedupLatest(tieFree, Seq("id"), "ts").orderBy("id").collect().toSeq
    val b = DedupLatest.viaAggregate(tieFree, Seq("id"), "ts")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("dedup yields unique keys") {
    val out = DedupLatest(dirty, Seq("id"), "ts")
    assert(out.count() == out.select("id").distinct().count())
  }
}
