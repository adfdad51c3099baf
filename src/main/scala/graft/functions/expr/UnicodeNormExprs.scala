package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[NfcNormalizeExpr]] — a top-level object so scalac emits a
  * static forwarder the generated code can call directly.
  */
object UnicodeNormKernel {
  /** Unicode NFC (canonical composition). The common case — already-NFC
    * text, which includes all ASCII — returns the input UTF8String
    * untouched (one linear scan, zero allocation).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a string column (CCNet-style corpus
  * canonicalization: composed vs decomposed accent sequences — 'é' vs
  * 'e'+U+0301 — must dedup/fingerprint identically). Generates a direct
  * static call, so scan-projection spines keep whole-stage codegen.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeNormKernel.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.UnicodeNormKernel.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

object UnicodeNormExprs {
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
}
