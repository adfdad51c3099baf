package graft.functions

import graft.SparkSpec
import graft.functions.expr.{AggExprs, CappedCollect}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** The load-bearing property of [[CappedCollect]] is the hard buffer
  * bound: cap+1 elements in update, merge, and after serde — this is what
  * makes the LSH bucket guard default-safe on mega-buckets (no task ever
  * buffers a hot bucket). Exercised directly on the aggregate object,
  * where the bound is observable, plus end-to-end through groupBy.
  */
class CappedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def agg(cap: Int) =
    CappedCollect(BoundReference(0, LongType, nullable = true), cap)

  test("update never grows the buffer past cap+1") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    (1L to 100000L).foreach(i => a.update(buf, InternalRow(i)))
    assert(buf.length == 4)
    assert(buf.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("merge truncates at cap+1 from either side") {
    val a = agg(3)
    val big = a.createAggregationBuffer()
    (1L to 50L).foreach(i => a.update(big, InternalRow(i)))
    val small = a.createAggregationBuffer()
    a.update(small, InternalRow(99L))
    assert(a.merge(small, big).length == 4)
    val big2 = a.createAggregationBuffer()
    (1L to 50L).foreach(i => a.update(big2, InternalRow(i)))
    assert(a.merge(big2, small).length == 4)
  }

  test("null inputs are skipped") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    a.update(buf, InternalRow(null))
    a.update(buf, InternalRow(7L))
    a.update(buf, InternalRow(null))
    assert(buf.toSeq == Seq(7L))
  }

  test("serialize/deserialize round-trips the buffer") {
    val a = agg(5)
    val buf = a.createAggregationBuffer()
    (10L to 14L).foreach(i => a.update(buf, InternalRow(i)))
    val rt = a.deserialize(a.serialize(buf))
    assert(rt.toSeq == buf.toSeq)
    // strings too (the copyValue / unsafe-view path)
    val s = CappedCollect(
      BoundReference(0, org.apache.spark.sql.types.StringType,
        nullable = true), 5)
    val sb = s.createAggregationBuffer()
    Seq("alpha", "beta").foreach(v =>
      s.update(sb, InternalRow(UTF8String.fromString(v))))
    assert(s.deserialize(s.serialize(sb)).map(_.toString) ==
      Seq("alpha", "beta"))
  }

  test("deserialized buffers own their bytes: merge-after-deserialize is alias-safe") {
    // `deserialize` keeps values as UnsafeRow VIEWS into the input byte
    // array (zero-copy by design). That is only sound if every caller hands
    // the buffer a byte array nobody reuses — which Spark's
    // TypedImperativeAggregate contract guarantees (UnsafeRow.getBinary
    // copies). This test pins the failure mode the design note claims
    // cannot happen: mutate the source bytes AFTER deserialize and show the
    // values DO alias (documenting why unique ownership is load-bearing),
    // then show merge-after-deserialize of two independently-owned buffers
    // preserves exact content.
    val s = CappedCollect(
      BoundReference(0, org.apache.spark.sql.types.StringType,
        nullable = true), 10)
    def bufOf(vs: String*) = {
      val b = s.createAggregationBuffer()
      vs.foreach(v => s.update(b, InternalRow(UTF8String.fromString(v))))
      b
    }
    // aliasing is real: corrupting the owned bytes corrupts the view
    val bytes = s.serialize(bufOf("aaaa", "bbbb"))
    val view = s.deserialize(bytes)
    assert(view.map(_.toString) == Seq("aaaa", "bbbb"))
    java.util.Arrays.fill(bytes, 0.toByte)
    assert(view.map(_.toString) != Seq("aaaa", "bbbb"),
      "expected views into the serialized bytes — if this fails the " +
        "zero-copy design note in deserialize() is stale")
    // ...and therefore each deserialize must get its own array: merging two
    // buffers deserialized from DIFFERENT arrays never cross-contaminates
    val left = s.deserialize(s.serialize(bufOf("left1", "left2")))
    val right = s.deserialize(s.serialize(bufOf("right1", "right2")))
    val merged = s.merge(left, right)
    assert(merged.map(_.toString) ==
      Seq("left1", "left2", "right1", "right2"))
    assert(s.eval(merged).asInstanceOf[
      org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString).toSeq ==
      Seq("left1", "left2", "right1", "right2"))
  }

  test("sort-based fallback path: forced-low threshold yields uncorrupted exact results") {
    // ObjectHashAggregateExec falls back to sort-based aggregation once a
    // task sees more than `fallbackThreshold` distinct groups — the path
    // where partial buffers are serialized, spilled group-sorted, then
    // deserialize+merge'd. Force it (threshold=2, 499 groups per task) and
    // prove (a) the plan is ObjectHashAggregate, (b) every collected string
    // survives serde/merge byte-exact. Values are unique per row, so any
    // reused-buffer aliasing in the fallback merge would surface as strings
    // that exist in no input row — set-membership is the corruption oracle.
    val n = 4000
    val nGroups = 499
    val rows = (0 until n).map(i =>
      (s"g${i % nGroups}", s"val_${i}_${"pad" * (i % 7)}"))
    val df = rows.toDF("k", "v").repartition(4)
    val truth = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val prevKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(prevKey)
    spark.conf.set(prevKey, "2")
    try {
      // cap above the max group size: the result must be EXACTLY the group
      val exact = df.groupBy("k")
        .agg(AggExprs.collectCapped(col("v"), 64).as("arr"))
      assert(exact.queryExecution.executedPlan.toString
        .contains("ObjectHashAggregate"))
      val got = exact.as[(String, Seq[String])].collect()
        .map { case (k, arr) => k -> arr.toSet }.toMap
      assert(got == truth)
      // cap below the group size: size is pinned at cap+1 and every element
      // still matches some real input value (bag-subset, no corruption)
      val capped = df.groupBy("k")
        .agg(AggExprs.collectCapped(col("v"), 3).as("arr"))
        .as[(String, Seq[String])].collect()
      assert(capped.length == nGroups)
      capped.foreach { case (k, arr) =>
        assert(arr.length == math.min(truth(k).size, 4))
        assert(arr.distinct.length == arr.length, s"dup in group $k")
        assert(arr.forall(truth(k).contains), s"corrupted value in group $k")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(prevKey, v)
      case None => spark.conf.unset(prevKey)
    }
  }

  test("groupBy: size <= cap is exact, cap+1 is the overflow signal") {
    val df = Seq.tabulate(10)(i => ("big", i.toLong)) ++
      Seq(("two", 0L), ("two", 1L), ("one", 0L))
    val out = df.toDF("k", "v")
      .groupBy("k")
      .agg(AggExprs.collectCapped(col("v"), 4).as("arr"))
      .select($"k", size($"arr").as("n"))
      .as[(String, Int)].collect().toMap
    assert(out == Map("big" -> 5, "two" -> 2, "one" -> 1))
    // under-cap groups collect every element exactly
    val exact = df.toDF("k", "v")
      .groupBy("k")
      .agg(AggExprs.collectCapped(col("v"), 100).as("arr"))
      .select($"k", array_sort($"arr").as("arr"))
      .as[(String, Seq[Long])].collect().toMap
    assert(exact("big") == (0L until 10L))
    assert(exact("two") == Seq(0L, 1L))
  }
}
