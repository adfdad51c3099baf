package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("topPaths: (ts,id)-ordered sequences, maxLen truncation, " +
      "deterministic ranking") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(s: Long) = new Timestamp(s * 1000L)
    // u1 session: view>click>buy; u2 TWO sessions (40min gap):
    // view>click then buy; u3: six events truncate at maxLen 3;
    // same-ts tie in u1 ordered by event_id
    val ev = Seq(
      (1L, 10L, at(0), "view"), (1L, 11L, at(0), "click"),
      (1L, 12L, at(60), "buy"),
      (2L, 20L, at(0), "view"), (2L, 21L, at(100), "click"),
      (2L, 22L, at(100 + 2400), "buy"),
      (3L, 30L, at(0), "a"), (3L, 31L, at(1), "b"), (3L, 32L, at(2), "c"),
      (3L, 33L, at(3), "d"), (3L, 34L, at(4), "e"), (3L, 35L, at(5), "f"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessionize.topPaths(ev, gapSeconds = 1800L, maxLen = 3,
        topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "view > click > buy" -> 1L, // u1 (tie broken by event_id)
      "view > click" -> 1L,       // u2 session 1
      "buy" -> 1L,                // u2 session 2
      "a > b > c" -> 1L))         // u3 truncated at 3
  }

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
