package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types._

/** Kafka source wiring for the streaming tier.
  *
  * The connector jar (`spark-sql-kafka-0-10`) is not present in this
  * container, so [[reader]]/[[source]] are configuration-complete but only
  * loadable where the connector is on the classpath — the standard Spark
  * deployment story. Everything downstream of the envelope (the part with
  * actual engine logic: decoding, lineage columns, event-time extraction)
  * is connector-independent and fully tested against batch frames with the
  * same envelope schema.
  *
  * Scale notes: one Kafka partition maps to one Spark input partition, so
  * topic partitioning IS the source parallelism — size topics accordingly
  * and use `minPartitions` to split hot partitions. `maxOffsetsPerTrigger`
  * bounds micro-batch size for predictable latency under backlog.
  */
object Kafka {

  /** The fixed record envelope every Kafka source emits. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  /** A configured streaming reader for `topics` (comma-separated subscribe
    * list). `.load()` requires the Kafka connector jar on the classpath.
    */
  def reader(spark: SparkSession, bootstrapServers: String, topics: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      minPartitions: Option[Int] = None): DataStreamReader = {
    val r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      // fail a restarted query that would silently skip compacted/expired
      // offsets instead of losing data quietly
      .option("failOnDataLoss", "true")
    val r2 = maxOffsetsPerTrigger.fold(r)(n =>
      r.option("maxOffsetsPerTrigger", n.toString))
    minPartitions.fold(r2)(n => r2.option("minPartitions", n.toString))
  }

  /** `reader(...).load()` — the envelope-shaped stream. */
  def source(spark: SparkSession, bootstrapServers: String, topics: String,
      startingOffsets: String = "latest"): DataFrame =
    reader(spark, bootstrapServers, topics, startingOffsets).load()

  /** Decode a JSON-valued envelope stream: parse `value` with `schema`,
    * keep (topic, partition, offset, kafka timestamp) as lineage columns —
    * offset+partition is the exactly-once bookkeeping key downstream sinks
    * use for idempotent upserts.
    */
  def decodeJson(envelope: DataFrame, schema: StructType): DataFrame =
    envelope.select(
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"),
      from_json(col("value").cast("string"), schema).as("payload"))
      .select(col("topic"), col("partition"), col("offset"),
        col("kafka_ts"), col("payload.*"))

  /** Decode + promote an event-time column with a watermark — the handoff
    * point into the windowed/sessionized operators of [[Streams]].
    */
  def decodeJsonWithEventTime(envelope: DataFrame, schema: StructType,
      eventTimeCol: String, watermark: String): DataFrame =
    decodeJson(envelope, schema)
      .withWatermark(eventTimeCol, watermark)
}
