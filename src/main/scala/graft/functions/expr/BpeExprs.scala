package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local kernels for BPE tokenizer training
  * ([[graft.operators.Bpe]]): initial character-symbol segmentation and
  * greedy merge application. Both are one primitive pass per row; the
  * merge pair rides the expression (driver-chosen per round, serialized
  * with the task binary — the same convention as
  * [[LongSetCountExpr]]'s probe set).
  */

/** Code-point symbols of a string as `array<string>` — the BPE base
  * vocabulary. Splits on CODE POINTS (surrogate pairs stay whole), which
  * is also how the oracle engine's character indexing behaves; a
  * regex-split on the empty pattern would split supplementary characters
  * into lone surrogates.
  */
case class CodePointSymbolsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"code_point_symbols expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[AnyRef](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(UTF8String.fromString(s.substring(i, i + n)))
      i += n
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "code_point_symbols"
}

/** One BPE merge applied to a symbol sequence: every non-overlapping
  * leftmost occurrence of adjacent `(left, right)` becomes the single
  * symbol `left+right` — the standard greedy left-to-right rule ("aaa"
  * under (a,a) yields ["aa","a"], not ["a","aa"]).
  */
case class BpeApplyExpr(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  // the null-symbol poison can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def nullSafeEval(v: Any): Any = {
    val syms = v.asInstanceOf[ArrayData]
    val n = syms.numElements()
    if (n < 2) return syms.copy()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      // a null symbol is malformed BPE input (the tokenizers never emit
      // one): poison the row to NULL instead of an NPE mid-merge
      if (syms.isNullAt(i)) return null
      if (i + 1 < n && syms.getUTF8String(i).equals(l) &&
          i + 1 < n && !syms.isNullAt(i + 1) &&
          syms.getUTF8String(i + 1).equals(r)) {
        out.add(lr)
        i += 2
      } else {
        // copy: the input view's backing buffer is reused across rows
        out.add(syms.getUTF8String(i).copy())
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bpe_apply"
}

/** A full learned merge table applied in rank order — one greedy
  * leftmost pass per merge, K passes per row ([[BpeApplyExpr]] folded),
  * exactly the symbol states the training loop visited. One expression
  * instead of K chained projections so the intermediate symbol arrays
  * never materialize as columns (and can't be re-inlined by the
  * optimizer — the [[WinnowFingerprintsExpr]] lesson).
  */
case class BpeEncodeExpr(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  // the null-symbol poison can return NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val pairs: Array[(UTF8String, UTF8String,
      UTF8String)] =
    merges.map { case (l, r) =>
      (UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + r))
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[ArrayData]
    var n = in.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // null symbols poison the row to NULL (malformed encoder input)
      if (in.isNullAt(i)) return null
      cur(i) = in.getUTF8String(i).copy(); i += 1
    }
    var m = 0
    while (m < pairs.length && n >= 2) {
      val (l, r, lr) = pairs(m)
      val next = new Array[UTF8String](n)
      var o = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && cur(i).equals(l) && cur(i + 1).equals(r)) {
          next(o) = lr
          i += 2
        } else {
          next(o) = cur(i)
          i += 1
        }
        o += 1
      }
      cur = next
      n = o
      m += 1
    }
    val out = new Array[AnyRef](n)
    i = 0
    while (i < n) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeExprs {
  def codePointSymbols(word: Column): Column =
    ColumnBridge.column(
      CodePointSymbolsExpr(ColumnBridge.expression(word)))

  def bpeApply(symbols: Column, left: String, right: String): Column =
    ColumnBridge.column(
      BpeApplyExpr(ColumnBridge.expression(symbols), left, right))

  def bpeEncode(symbols: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncodeExpr(ColumnBridge.expression(symbols), merges))
}
