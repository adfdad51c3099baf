package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Parquet table loading + kernel-stage parallelism helpers. */
object Tables {

  /** Inferred parquet schemas, cached per (session UUID, path). Every
    * schema-less `spark.read.parquet` runs a one-task schema-inference
    * job (a distributed footer read) before the query proper — measured
    * as 0.1-0.2s of pure fixed cost per table reference at bench scale,
    * and a redundant driver round-trip at any scale, since a table's
    * footer schema never changes mid-run. This caches METADATA only (the
    * role a catalog/metastore plays in production); row data is always
    * re-read from parquet. WEAK-keyed on the session object itself
    * (nested path map): a dead session's entries evict with the session
    * instead of accumulating for the JVM's life, and — unlike the old
    * identityHashCode key — a post-GC identity-hash reuse can never hand
    * a new session a schema inferred under different confs (confs like
    * parquet nanosAsLong legitimately change what schema the same footer
    * infers to).
    */
  private val schemaCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, org.apache.spark.sql.types.StructType]]())

  /** Read a parquet location whose CONTRACT is immutability for the
    * session's life (the generated testdata tables; committed
    * VersionedTable version dirs and their index sidecars): first read
    * infers and caches the schema, later reads skip the inference job.
    * A location rewritten mid-session (out of contract) would be read
    * with the stale schema — callers own that guarantee.
    */
  def readImmutable(spark: SparkSession, path: String): DataFrame = {
    val perSession = schemaCache.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[
        String, org.apache.spark.sql.types.StructType]())
    val schema = perSession.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    readImmutable(spark, s"$dir/$name.parquet")

  /** The events table with `ts` normalized to a session-zone microsecond
    * TIMESTAMP regardless of how the parquet encodes it. Generators have
    * shipped the column both as TIMESTAMP(NANOS) — which Spark only reads
    * via `spark.sql.legacy.parquet.nanosAsLong` as a bigint — and as plain
    * micros, which Spark 4 surfaces as TIMESTAMP_NTZ. Every value is
    * microsecond-aligned and sessions run in UTC, so both rewrites are
    * exact and agree with DuckDB's native read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Ensure a frame about to enter a CPU-dominant kernel stage (ICWS /
    * MinHash signatures, hashed-n-gram training) runs with at least the
    * session's default parallelism.
    *
    * Parquet splits only at row-group boundaries, and a source with fewer
    * row groups than the session has cores serializes the whole kernel:
    * the x27 ICWS signature pass measured 1.4s single-threaded vs ~0.1s
    * wide at sf0.1. When the input is undersplit, hash-repartition by
    * `key` (cheap, even-spread; avoids round-robin's sort-before-shuffle);
    * otherwise return the frame untouched. At production scale a 100 TB
    * scan has thousands of row groups, the condition is false, and this is
    * a no-op — the shuffle only fires when its volume is bounded by an
    * undersplit (i.e. small) input.
    *
    * Deliberately NOT applied at table load: a blanket repartition after
    * every scan measured +29s across the 96-query suite (scan-centric
    * relational queries pay an exchange for kernels they don't have) vs
    * -2s concentrated in the kernel operators that this helper targets.
    */
  /** [[widenForKernel]] with a ROUND-ROBIN spread instead of a hash key —
    * for kernels whose natural key can be value-degenerate (e.g. a
    * profiler widening on the profiled columns themselves: a constant or
    * all-null column — the exact broken-column case a profiler exists to
    * surface — hashes every row to one partition, paying the shuffle yet
    * still building serially). Round-robin pays the
    * sort-before-repartition local sort, which is bounded here because
    * the widen only ever fires on an undersplit (single-digit-row-group)
    * input; production-width scans skip it entirely.
    */
  def widenForKernelEven(df: DataFrame): DataFrame =
    widenForKernelWith(df, _.repartition(
      df.sparkSession.sparkContext.defaultParallelism))

  def widenForKernel(df: DataFrame, key: Column): DataFrame =
    widenForKernelWith(df, d => d.repartition(
      d.sparkSession.sparkContext.defaultParallelism, key))

  private def widenForKernelWith(df: DataFrame,
      spread: DataFrame => DataFrame): DataFrame = {
    // Only a bare scan pipeline (project/filter over a relation) can be
    // undersplit: anything downstream of a shuffle already runs at
    // spark.sql.shuffle.partitions, and anything cached at its cache
    // width. Detecting this on the LOGICAL plan matters for more than
    // precision — under AQE, probing `df.rdd` on a plan with shuffles
    // EXECUTES those shuffle stages eagerly (getFinalPhysicalPlan), which
    // measured +2.4s on the corpus funnel when this helper probed a
    // not-yet-materialized cached dedup frame. For scan-only plans the
    // .rdd probe is free (no stages to run).
    // allow-list, not a shuffle deny-list: any node beyond project/filter
    // over a leaf (GlobalLimit, typed MapGroups, joins, aggregates, ...)
    // either implies the frame is already post-shuffle wide or makes the
    // .rdd probe unsafe — skip widening for all of them
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val nodes = df.queryExecution.optimizedPlan.collect { case p => p }
    // a cached frame already sits at its cache width (post-shuffle or
    // scan width at persist time) — and the .rdd probe on it is not free:
    // it builds the physical plan and pays a janino whole-stage-codegen
    // compile just to read a partition count (measured ~0.5s per funnel
    // stage). Skip it outright.
    if (nodes.exists(_.isInstanceOf[InMemoryRelation])) return df
    val scanOnly = nodes.forall {
      case _: Project | _: Filter => true
      case _: LeafNode => true
      case _ => false
    }
    if (!scanOnly) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) spread(df) else df
  }

  /** [[widenForKernel]] for kernels that sit UNDER a filter: widening alone
    * doesn't help those, because Catalyst substitutes computed signal
    * columns through the Project and pushes the (expensive) predicate below
    * the repartition — back onto the undersplit scan task. A nondeterministic
    * project column doesn't survive as a barrier either (column pruning
    * removes it, re-enabling the push). The reliable barrier is an object
    * serde boundary: a typed identity `map` inserts
    * DeserializeToObject/SerializeFromObject nodes that no predicate or
    * projection crosses. Lazy (unlike an `.rdd` round-trip, which under AQE
    * executes the shuffle at plan-build time) at the price of one
    * row-serde pass — noise next to the kernels this guards.
    *
    * No-op (no exchange, no barrier) whenever [[widenForKernel]] is: wide
    * scans, post-shuffle frames, and cached frames keep their plans intact,
    * so real multi-split tables at scale never pay the serde.
    */
  def widenBarrierForKernel(df: DataFrame, key: Column): DataFrame = {
    val wide = widenForKernel(df, key)
    if (wide eq df) df
    else wide.map(identity(_))(org.apache.spark.sql.Encoders.row(wide.schema))
  }
}
