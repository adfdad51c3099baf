package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming state management and observability.
  *
  * Two production concerns the windowed/sessionized operators depend on:
  *
  * 1. **State store backend.** The default HDFS-backed provider keeps every
  *    key in executor heap — fine for bounded window state, an OOM risk for
  *    high-cardinality session state at 100 TB event volume. RocksDB (local
  *    SSD spill, off-heap) with changelog checkpointing (upload only the
  *    delta per batch, not a full snapshot) is the scale configuration.
  *
  * 2. **Queryable state.** Debugging "why is this session still open" or
  *    "how big is my state" must not require adding print sinks to a
  *    production query. Spark 4's state data source reads the committed
  *    state of any checkpoint as a DataFrame; [[stateSnapshot]] wraps it.
  */
object StateOps {

  /** Session configs that switch stateful queries to RocksDB with
    * changelog checkpointing + bounded memory. Set before starting the
    * query (`configs.foreach { case (k, v) => spark.conf.set(k, v) }`).
    */
  val rocksDbConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // upload per-batch changelogs instead of full snapshots
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true",
    // cap block-cache + memtable memory across all stores on an executor
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true")

  /** Apply [[rocksDbConfigs]] to the session; returns the previous values
    * so callers can restore them.
    */
  def useRocksDb(spark: SparkSession): Map[String, Option[String]] = {
    val prev = rocksDbConfigs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    rocksDbConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    prev
  }

  /** Committed state of a stateful operator in `checkpointDir` as a
    * DataFrame of (key struct, value struct, partition_id) — the state
    * data source. Defaults to the latest committed batch and operator 0;
    * `batchId` rewinds to any retained snapshot, `storeName`/`joinSide`
    * address the multi-store operators (stream-stream join).
    */
  def stateSnapshot(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0, storeName: Option[String] = None,
      batchId: Option[Long] = None, joinSide: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
    storeName.foreach(s => r = r.option("storeName", s))
    batchId.foreach(b => r = r.option("batchId", b.toString))
    joinSide.foreach(s => r = r.option("joinSide", s))
    r.load(checkpointDir)
  }

  /** State-size profile per partition: rows of (partition_id, n_keys).
    * The first thing to look at when a stateful query's batch times grow —
    * skewed partitions mean a skewed grouping key.
    */
  def stateSizeByPartition(spark: SparkSession,
      checkpointDir: String, operatorId: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions._
    stateSnapshot(spark, checkpointDir, operatorId)
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("partition_id"))
  }
}
