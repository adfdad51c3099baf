package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The connector-independent half of the Kafka wiring: decoding and
  * event-time promotion over the fixed envelope schema (batch frames here;
  * the envelope is identical in streaming).
  */
class KafkaSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("action", StringType),
    StructField("ts", TimestampType)))

  private def envelope = {
    def rec(k: String, v: String, part: Int, off: Long) = Row(
      k.getBytes("UTF-8"), v.getBytes("UTF-8"), "events", part, off,
      Timestamp.valueOf("2026-01-01 00:00:10"), 0)
    spark.createDataFrame(
      java.util.Arrays.asList(
        rec("u1", """{"user_id":1,"action":"click","ts":"2026-01-01T00:00:01Z"}""", 0, 100L),
        rec("u2", """{"user_id":2,"action":"view","ts":"2026-01-01T00:00:02Z"}""", 1, 7L),
        rec("u3", "not json at all", 1, 8L)),
      Kafka.envelopeSchema)
  }

  test("decodeJson unpacks payload and keeps lineage columns") {
    val out = Kafka.decodeJson(envelope, payloadSchema)
    assert(out.columns.toSeq ==
      Seq("topic", "partition", "offset", "kafka_ts", "user_id", "action", "ts"))
    val rows = out.orderBy("offset").collect()
    assert(rows.length == 3)
    val r = rows.find(_.getLong(2) == 7L).get
    assert(r.getString(0) == "events" && r.getInt(1) == 1)
    assert(r.getLong(4) == 2L && r.getString(5) == "view")
    // malformed JSON degrades to null payload fields, never a dropped row
    val bad = rows.find(_.getLong(2) == 8L).get
    assert(bad.isNullAt(4) && bad.isNullAt(5))
  }

  test("decodeJsonWithEventTime attaches the watermark to the event column") {
    // batch plans eliminate EventTimeWatermark; use a streaming envelope
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long,
      Timestamp, Int)]
    val stream = input.toDF().toDF("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType")
    val out = Kafka.decodeJsonWithEventTime(stream, payloadSchema,
      "ts", "10 minutes")
    assert(out.isStreaming)
    assert(out.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    // and the batch form still evaluates (watermark is a documented no-op)
    val batch = Kafka.decodeJsonWithEventTime(envelope, payloadSchema,
      "ts", "10 minutes")
    assert(batch.filter(col("user_id").isNotNull).count() == 2)
  }

  test("reader is configurable without the connector jar") {
    // construction must not require kafka classes; only .load() does
    val r = Kafka.reader(spark, "broker:9092", "events,clicks",
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(10000L),
      minPartitions = Some(64))
    assert(r != null)
  }
}
