package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two float/double
  * array columns in one tight primitive loop.
  *
  * Rationale (SURVEY.md §7.4 "custom Catalyst work"): the higher-order
  * function formulation ([[graft.functions.VectorFunctions.cosine]]) walks the
  * arrays three times through the lambda interpreter with boxed accumulators;
  * on the brute-force KNN hot path (corpus x queries candidate scoring) this
  * expression does one pass over primitive arrays — the difference between
  * the scoring stage being compute-bound vs interpreter-bound at scale.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // dimension mismatch is a data bug — surface it as NULL, never as a
    // plausible-looking score from a silently truncated dot product
    if (n != b.numElements()) return null
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // null elements poison the whole similarity (result NULL) rather than
      // being skipped — skipping would misalign the remaining dimensions
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarityExpr {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarityExpr(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
}
