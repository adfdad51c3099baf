package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit hash column against a pre-built
  * [[BloomFilter]] (Spark's public sketch, the same implementation
  * `DataFrameStatFunctions.bloomFilter` builds). The filter rides the
  * expression into the task binary — one broadcast per stage — and the
  * probe is row-local, so a scan-side filter against a reference set of
  * any corpus-scale cardinality costs zero shuffle on the probing side.
  * False positives happen at the configured fpp (callers verify positives
  * exactly); false negatives never do — `!probe` is a PROOF of absence,
  * which is what makes bloom-pruned anti joins sound
  * ([[graft.operators.Dedup.crossExactDedup]]).
  */
case class BloomProbeExpr(child: Expression, filter: BloomFilter)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {
  def mightContainLong(hash: Column, filter: BloomFilter): Column =
    ColumnBridge.column(
      BloomProbeExpr(ColumnBridge.expression(hash), filter))
}
