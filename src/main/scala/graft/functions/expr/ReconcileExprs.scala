package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable string fingerprint fold used by the
  * reconciliation tier ([[graft.operators.Reconcile.columnChecksums]]):
  * `h = (h*31 + codepoint) % 1000003` over the string's code points,
  * from 0 — identical to the [[graft.operators.Dsir]] token fold the
  * DuckDB oracle replays with `list_reduce`.
  *
  * Native kernel rather than the `aggregate(transform(sequence(...)))`
  * HOF form: the HOF indexes with `substr(i, 1)`, and UTF8String
  * substring rescans variable-width bytes from the start, making the
  * per-value fold O(len²) — a scaling trap for long string columns in
  * an operator positioned as the 100 TB reconciliation form. This walks
  * the decoded code points ONCE (O(len)), inside whole-stage codegen
  * (one static call per row, loop JIT-compiled).
  *
  * Code-point semantics match both replay engines on the full range —
  * Spark's `substr`/`ascii` and DuckDB's string indexing both count
  * code points — so the previous BMP-only caveat narrows to "both
  * engines agree on code points", which they do everywhere.
  */
case class CodepointFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"codepoint_fold expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    CodepointFoldExpr.fold(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.CodepointFoldExpr.fold($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "codepoint_fold"
}

object CodepointFoldExpr {
  /** One O(len) pass over the code points; called from both the
    * interpreted and the generated path so they cannot drift.
    */
  def fold(v: UTF8String): Long = {
    val s = v.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000003L
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CodepointFoldExpr(ColumnBridge.expression(c)))
}
