package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StateOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runWindowedQuery(checkpoint: String): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      window_ = "1 hour", watermark = "30 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("noop").start()
    // batch 1 only advances the watermark to 09:50 — nothing evicts
    input.addData(
      (ts("2024-01-01 10:10:00"), "view", 1.0),
      (ts("2024-01-01 10:20:00"), "view", 2.0))
    q.processAllAvailable()
    // batch 2: watermark reaches 11:40, closing (and evicting) the 10:00
    // windows; 12:00 stays open in state
    input.addData(
      (ts("2024-01-01 10:40:00"), "click", 3.0),
      (ts("2024-01-01 12:10:00"), "view", 4.0))
    q.processAllAvailable()
    q.stop()
  }

  test("stateSnapshot exposes committed window-aggregation state") {
    val cp = Files.createTempDirectory("graft-state-cp").toString
    runWindowedQuery(cp)
    val snap = StateOps.stateSnapshot(spark, cp)
    // append-mode state holds exactly the windows the watermark has NOT yet
    // closed: the 10:00 windows were emitted+evicted when the watermark hit
    // 11:40, so only 12:00/view survives
    val keys = snap
      .select(col("key.event_type").as("et"),
        col("key.window.start").cast("string").as("ws"))
      .as[(String, String)].collect().toSet
    assert(keys == Set(("view", "2024-01-01 12:00:00")))
    // the value struct is the raw aggregation buffer (count/sum/isEmpty)
    val r = snap.select(col("value.count")).head()
    assert(r.getLong(0) == 1L)
    // rewind: at batch 0 the state still held both 10:00 windows
    val earlier = StateOps.stateSnapshot(spark, cp, batchId = Some(0L))
      .select(col("key.event_type").as("et"),
        col("key.window.start").cast("string").as("ws"))
      .as[(String, String)].collect().toSet
    assert(earlier == Set(("view", "2024-01-01 10:00:00")))
  }

  test("stateSizeByPartition profiles key placement") {
    val cp = Files.createTempDirectory("graft-state-cp2").toString
    runWindowedQuery(cp)
    val prof = StateOps.stateSizeByPartition(spark, cp)
      .as[(Int, Long)].collect()
    assert(prof.map(_._2).sum == 1L)
    assert(prof.forall(_._2 > 0)) // only non-empty partitions listed
  }

  test("RocksDB provider runs the same query and state stays queryable") {
    val cp = Files.createTempDirectory("graft-state-rocks").toString
    val prev = StateOps.useRocksDb(spark)
    try {
      runWindowedQuery(cp)
      val n = StateOps.stateSnapshot(spark, cp).count()
      assert(n == 1L)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
