package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved `new Column(expr)` / `col.expr` behind the
  * `org.apache.spark.sql.classic` package-private API; extension libraries
  * conventionally expose them through a shim living under
  * `org.apache.spark.sql` (same technique Spark connector/extension projects
  * use). This is the only file outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` — wrap an already-analyzed logical plan as a
    * DataFrame (used by the auto-binSize derivation in
    * `graft.plans.RangeJoinRewrite`, which must run a bounded stats query
    * over one side of a join it is rewriting).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
