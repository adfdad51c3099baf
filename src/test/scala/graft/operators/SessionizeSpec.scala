package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (1L, 11L, ts("2024-01-01 10:10:00")), // same session (10 min gap)
    (1L, 12L, ts("2024-01-01 11:30:00")), // new session (80 min gap)
    (2L, 20L, ts("2024-01-01 09:00:00")),
    (2L, 21L, ts("2024-01-01 09:30:00")), // exactly 30 min -> same session
    (2L, 22L, ts("2024-01-01 10:00:01")) // 30m01s -> new session
  ).toDF("user_id", "event_id", "ts")

  test("sessions split on gaps strictly greater than the threshold") {
    val out = Sessionize.aggregate(events, gapSeconds = 1800L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("n_events")))
      .toMap
    assert(out == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L,
      (2L, 1L) -> 2L, (2L, 2L) -> 1L))
  }

  test("session duration is exact in microseconds") {
    val d = Sessionize.aggregate(events, gapSeconds = 1800L)
      .filter($"user_id" === 1L && $"session_seq" === 1L)
      .head().getAs[Long]("duration_us")
    assert(d == 600000000L) // 10 minutes
  }

  test("session ids are consecutive per user starting at 1") {
    val seqs = Sessionize(events, gapSeconds = 1800L)
      .select("user_id", "session_seq").as[(Long, Long)]
      .collect().toSet
    assert(seqs == Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
  }
}
