package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expr.{LongSetCountExpr, TermCountsExpr}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Kernel-level properties of the broadcast-set probe expressions: the
  * open-addressing table of [[LongSetCountExpr]] and the UTF8String map of
  * [[TermCountsExpr]] must agree with the naive reference count on
  * arbitrary inputs — including 0L (the empty-slot sentinel, tracked out of
  * band), duplicate set entries, duplicate probes, and empty arrays.
  * Direct `nullSafeEval` calls: no Spark jobs, thousands of cases.
  */
object ProbeKernelProperties extends Properties("graft.probe-kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(500)

  private val genLongs: Gen[List[Long]] = Gen.listOf(Gen.oneOf(
    Gen.choose(-5L, 5L), // dense small range incl. 0 => collisions + sentinel
    Gen.choose(Long.MinValue, Long.MaxValue)))

  property("long_set_count equals the naive membership count") =
    forAll(genLongs, genLongs) { (arr, set) =>
      val expr = LongSetCountExpr(
        Literal.create(null, ArrayType(LongType)), set.toArray)
      val got = expr.nullSafeEval(
        new GenericArrayData(arr.toArray)).asInstanceOf[Long]
      val want = arr.count(set.toSet.contains).toLong
      got == want
    }

  private val genToks: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "", "é", "zz", "0"))

  property("term_counts equals the naive per-term count, aligned") =
    forAll(genToks, genToks) { (toks, terms) =>
      val expr = TermCountsExpr(
        Literal.create(null, ArrayType(StringType)), terms.toArray)
      val got = expr.nullSafeEval(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      // duplicate terms: every occurrence counts toward the FIRST index
      val firstIx = terms.zipWithIndex.reverse.toMap
      val want = terms.indices.map { i =>
        if (firstIx(terms(i)) == i) toks.count(_ == terms(i)).toLong else 0L
      }
      got == want
    }
}
