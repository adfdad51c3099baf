package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.expr.EwmaScanExpr

/** Property laws for the EWMA scan kernel — evaluated at the expression
  * level (Catalyst literals, no Spark jobs), so hundreds of cases are
  * cheap. The x82 oracle checks one real series against DuckDB; this
  * sweeps the space: arbitrary values/lengths/alphas, the alpha=1
  * pass-through, bounds, and exact equality with an independent fold.
  */
object SeriesProperties extends Properties("graft.series") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  private def run(xs: Array[Double], alpha: Double): Seq[Double] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit = Literal.create(ArrayData.toArrayData(xs),
      ArrayType(DoubleType, containsNull = false))
    EwmaScanExpr(lit, alpha).eval()
      .asInstanceOf[ArrayData].toDoubleArray().toSeq
  }

  private val genSeries: Gen[List[Double]] =
    Gen.listOf(Gen.choose(-1e6, 1e6))
  private val genAlpha: Gen[Double] = Gen.choose(0.01, 1.0)

  property("exact equality with an independent left fold") =
    forAll(genSeries, genAlpha) { (xs, alpha) =>
      val expect = xs.drop(1).scanLeft(xs.headOption.getOrElse(0.0)) {
        (acc, x) => alpha * x + (1.0 - alpha) * acc
      }.take(xs.length)
      run(xs.toArray, alpha) == expect
    }

  property("alpha = 1 is the identity; output length matches input") =
    forAll(genSeries) { xs =>
      val out = run(xs.toArray, 1.0)
      out.length == xs.length && out == xs
    }

  property("each running value stays within the min/max of its prefix " +
      "(convexity of the recurrence)") =
    forAll(genSeries.suchThat(_.nonEmpty), genAlpha) { (xs, alpha) =>
      val out = run(xs.toArray, alpha)
      out.zipWithIndex.forall { case (e, i) =>
        val prefix = xs.take(i + 1)
        e >= prefix.min - 1e-9 && e <= prefix.max + 1e-9
      }
    }
}
