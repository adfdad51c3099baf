package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Homoglyph "skeleton" normalization (the Unicode UTS #39 confusables
  * idea, reduced to an explicit, documented mapping): map visually
  * confusable code points onto their Latin/ASCII skeleton and strip
  * zero-width characters. The curation use is adversarial dedup — spam
  * and SEO text evades exact/near dedup by swapping Latin letters for
  * identical-looking Cyrillic/Greek ones or salting with zero-width
  * joiners; under the skeleton those variants collapse back onto their
  * original.
  *
  * The mapping is deliberately a SMALL closed table (the high-frequency
  * Latin-lookalikes + width/空白 variants), not a full UTS #39 database:
  * every entry is visible below, the DuckDB oracle replays it verbatim,
  * and extending it is a one-line diff. One primitive pass per row;
  * unmapped code points copy through untouched.
  */
case class ConfusableSkeletonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"confusable_skeleton expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      val mapped = ConfusableSkeletonExpr.table.get(cp)
      if (mapped == null) sb.appendCodePoint(cp)
      else sb.append(mapped) // "" entries strip (zero-width characters)
      i += n
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "confusable_skeleton"
}

object ConfusableSkeletonExpr {
  /** code point -> skeleton ("" = strip). Cyrillic/Greek Latin-lookalike
    * lowercase letters, their capitals, fullwidth ASCII, zero-width and
    * exotic-space characters.
    */
  private[expr] val table: java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String]()
    def put(cp: Int, out: String): Unit = m.put(cp, out)
    // Cyrillic lowercase lookalikes
    put(0x0430, "a"); put(0x0435, "e"); put(0x043E, "o"); put(0x0440, "p")
    put(0x0441, "c"); put(0x0445, "x"); put(0x0443, "y"); put(0x0456, "i")
    put(0x0455, "s"); put(0x0458, "j"); put(0x04BB, "h"); put(0x0501, "d")
    // Cyrillic capitals
    put(0x0410, "A"); put(0x0415, "E"); put(0x041E, "O"); put(0x0420, "P")
    put(0x0421, "C"); put(0x0425, "X"); put(0x0423, "Y"); put(0x0406, "I")
    put(0x0405, "S"); put(0x0408, "J"); put(0x041C, "M"); put(0x041D, "H")
    put(0x0412, "B"); put(0x041A, "K"); put(0x0422, "T")
    // Greek lookalikes
    put(0x03BF, "o"); put(0x03BD, "v"); put(0x0391, "A"); put(0x0392, "B")
    put(0x0395, "E"); put(0x0396, "Z"); put(0x0397, "H"); put(0x0399, "I")
    put(0x039A, "K"); put(0x039C, "M"); put(0x039D, "N"); put(0x039F, "O")
    put(0x03A1, "P"); put(0x03A4, "T"); put(0x03A5, "Y"); put(0x03A7, "X")
    // fullwidth ASCII block FF01-FF5E -> ASCII 21-7E
    var fw = 0xFF01
    while (fw <= 0xFF5E) { put(fw, (fw - 0xFF01 + 0x21).toChar.toString); fw += 1 }
    // zero-width & joiner characters strip; exotic spaces -> plain space
    put(0x200B, ""); put(0x200C, ""); put(0x200D, ""); put(0xFEFF, "")
    put(0x00AD, "") // soft hyphen
    put(0x00A0, " "); put(0x2009, " "); put(0x202F, " "); put(0x3000, " ")
    m
  }
}

object ConfusableExprs {
  def confusableSkeleton(text: Column): Column =
    ColumnBridge.column(
      ConfusableSkeletonExpr(ColumnBridge.expression(text)))
}
