package graft.functions.expr

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Aggregates with hard per-group memory bounds. */
object AggExprs {

  /** Collect up to `cap + 1` values of `e` per group, as an array.
    *
    * The +1 is the overflow signal: a result of size `cap + 1` means the
    * group had MORE than `cap` rows (how many more is deliberately not
    * tracked), so `size(result) <= cap` is exactly the "group size <= cap"
    * predicate while `size(result) >= 2` is exactly "group size >= 2".
    *
    * Why not `collect_list` + a size filter: `collect_list`'s buffer grows
    * with the group, so one degenerate group (an LSH boilerplate
    * mega-bucket, a skewed key) costs a task O(group) memory before any
    * filter can drop it. [[CappedCollect]]'s buffer never exceeds
    * `cap + 1` elements — in the partial (map-side) aggregate, in every
    * merge, and in the final aggregate — so a mega-group costs O(rows)
    * STREAMED work and O(cap) memory, never O(group) buffering. This is
    * the load-bearing property for default-safe LSH bucket capping; see
    * [[graft.operators.Dedup]].
    */
  def collectCapped(e: Column, cap: Int): Column = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    ColumnBridge.column(
      CappedCollect(ColumnBridge.expression(e), cap).toAggregateExpression())
  }
}

/** `collect_list` with a hard buffer cap of `cap + 1` elements — see
  * [[AggExprs.collectCapped]]. Standard `TypedImperativeAggregate` shape
  * (object buffer + Unsafe array serialization) so it participates in
  * map-side partial aggregation under `ObjectHashAggregateExec`, with the
  * sort-based fallback spilling group-sorted ROWS, never whole groups.
  *
  * Determinism note: element ORDER in the result depends on task/merge
  * scheduling (same as `collect_list`); callers must treat the result as
  * a bag. Null inputs are skipped (SQL aggregate convention).
  */
case class CappedCollect(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buf: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      // copy: unsafe-backed values (UTF8String, structs) are views into
      // buffers the scan reuses across rows
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.length <= cap && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val bufferProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    bufferProjection.apply(
      InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    // values are views into `bytes`, which this buffer uniquely owns
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf += v)
    buf
  }

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CappedCollect = copy(child = newChild)
  override def prettyName: String = "collect_capped"
}
