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
