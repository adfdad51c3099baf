package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Ordered-series scan kernels. A running recurrence (EWMA) is the one
  * shape Spark's HOFs cannot express: `transform` sees one element at a
  * time with no carried state, `aggregate` folds to a single final value
  * — neither yields the PER-STEP running series. The kernel takes the
  * (already period-ordered, bounded — one element per PERIOD, never per
  * event) series as an array and emits the aligned running-value array
  * in one O(n) pass.
  *
  * Determinism contract: `acc' = alpha * x + (1 - alpha) * acc` with
  * `e_0 = x_0` (the pandas `adjust=False` convention), evaluated
  * strictly left-to-right — a DuckDB recursive CTE replays the identical
  * double arithmetic, so values agree bitwise and the query-level 6dp
  * rounding only absorbs formatting.
  */
case class EwmaScanExpr(child: Expression, alpha: Double)
    extends UnaryExpression with CodegenFallback {

  require(alpha > 0.0 && alpha <= 1.0, s"ewma alpha must be in (0, 1], got $alpha")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ewma_scan expects array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) throw new IllegalArgumentException(
        s"ewma_scan: null element at position $i — fill gaps upstream")
      acc = if (i == 0) xs.getDouble(0)
            else alpha * xs.getDouble(i) + (1.0 - alpha) * acc
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "ewma_scan"
}

object SeriesExprs {
  /** Running EWMA over an ordered `array<double>` series. */
  def ewmaScan(series: Column, alpha: Double): Column =
    ColumnBridge.column(
      EwmaScanExpr(ColumnBridge.expression(series), alpha))
}
