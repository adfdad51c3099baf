package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null-handling policies for a single column (reference D7,
  * `/root/reference/src/pipeline.py:65,81,111-114` and `metadata.json:9-12`).
  */
sealed trait NullPolicy
object NullPolicy {
  /** Drop the whole row when the column is null (reference: `order_date`). */
  case object DropRow extends NullPolicy
  /** Replace null with a default literal (reference: `unit_price` -> 0). */
  final case class Default(value: Any) extends NullPolicy
  /** Replace null with the conformed UNKNOWN key (reference: `customer_id` -> -1). */
  final case class ToUnknown(unknownKey: Any) extends NullPolicy

  def apply(df: DataFrame, column: String, policy: NullPolicy): DataFrame =
    policy match {
      case DropRow => df.filter(col(column).isNotNull)
      case Default(v) =>
        // cast the literal to the column's type: under ANSI mode (Spark 4
        // default) mixed-type coercion would instead cast the COLUMN to the
        // literal's type and throw on non-numeric strings
        df.withColumn(column, coalesce(col(column),
          lit(v).cast(df.schema(column).dataType)))
      case ToUnknown(k) =>
        df.withColumn(column,
          when(col(column).isNull, lit(k).cast(df.schema(column).dataType))
            .otherwise(col(column)))
    }
}

/** Orphan (dangling-FK) policies for fact->dimension conformance
  * (reference D8 — documented contract `defesa.txt:62` vs actual behavior;
  * SURVEY.md §2.9 divergence).
  */
sealed trait OrphanPolicy
object OrphanPolicy {
  /** Documented reference contract: dangling FK -> UNKNOWN key (-1). Default. */
  final case class MapToUnknown(unknownKey: Any = -1) extends OrphanPolicy
  /** Actual reference behavior: dangling FKs pass through untouched
    * (left USING join keeps the left key, `pipeline.py:107-110`). Exists to
    * bit-reproduce the committed golden outputs.
    */
  case object KeepDangling extends OrphanPolicy
  /** Drop orphan rows entirely (reference parts_sales inner join,
    * `pipeline.py:124-127`).
    */
  case object Reject extends OrphanPolicy
}

object Conform {

  /** Conform a fact's FK against a dimension's PK under an [[OrphanPolicy]].
    *
    * Scale: the probe side is `dim.select(pk)` only (column-pruned before the
    * join); a dimension that fits the broadcast threshold becomes a broadcast
    * hash join with zero fact shuffle — callers pass `broadcastDim = true`
    * (default) for classic star schemas. Set it false for a dimension too big
    * to broadcast, in which case Catalyst plans a shuffled hash / sort-merge
    * join on the FK.
    */
  def fact(factDf: DataFrame, fk: String, dim: DataFrame, pk: String,
      policy: OrphanPolicy, broadcastDim: Boolean = true): DataFrame = {
    val keys0 = dim.select(col(pk).as("__dim_pk")).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    val joined = factDf.join(keys, factDf(fk) === keys("__dim_pk"), "left")
    policy match {
      case OrphanPolicy.MapToUnknown(unknownKey) =>
        joined
          .withColumn(fk,
            when(col("__dim_pk").isNull,
              lit(unknownKey).cast(factDf.schema(fk).dataType))
              .otherwise(col(fk)))
          .drop("__dim_pk")
      case OrphanPolicy.KeepDangling =>
        joined.drop("__dim_pk")
      case OrphanPolicy.Reject =>
        joined.filter(col("__dim_pk").isNotNull).drop("__dim_pk")
    }
  }

  /** Append the conformed UNKNOWN member to a dimension (reference D9/U1,
    * `/root/reference/src/pipeline.py:98-105`): key column gets `unknownKey`,
    * every string column the `filler` sentinel, and every non-string column a
    * typed NULL — casting the string "UNKNOWN" to a numeric/date column would
    * throw under Spark 4's default ANSI mode (and silently turn into NULL with
    * ANSI off), so the sentinel is reserved for columns that can hold it.
    * The reference's dimensions are all-string, where this reduces to its
    * exact behavior.
    */
  def withUnknownMember(dim: DataFrame, keyCol: String,
      unknownKey: Any = -1, filler: String = "UNKNOWN"): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val one = dim.sparkSession.range(1)
    val row = one.select(dim.schema.fields.map { f =>
      val v: Column =
        if (f.name == keyCol) lit(unknownKey).cast(f.dataType)
        else f.dataType match {
          case StringType => lit(filler)
          case dt => lit(null).cast(dt)
        }
      v.as(f.name)
    }.toSeq: _*)
    dim.unionByName(row)
  }
}
