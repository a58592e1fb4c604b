package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class TimeWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling counts bucket on aligned boundaries") {
    val ev = Seq(
      (ts("2024-01-01 10:05:00"), "click"), (ts("2024-01-01 10:55:00"), "click"),
      (ts("2024-01-01 11:01:00"), "click"), (ts("2024-01-01 10:30:00"), "view")
    ).toDF("ts", "event_type")
    val got = TimeWindows.tumblingCounts(ev, "ts", "event_type", "1 hour")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L),
      (ts("2024-01-01 11:00:00"), "click", 1L),
      (ts("2024-01-01 10:00:00"), "view", 1L)))
  }

  test("sliding counts place each event in width/slide overlapping windows") {
    val ev = Seq((ts("2024-01-01 10:05:00"), "click")).toDF("ts", "event_type")
    val got = TimeWindows.slidingCounts(ev, "ts", "event_type", "1 hour", "15 minutes")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == Set(
      (ts("2024-01-01 09:15:00"), "click", 1L),
      (ts("2024-01-01 09:30:00"), "click", 1L),
      (ts("2024-01-01 09:45:00"), "click", 1L),
      (ts("2024-01-01 10:00:00"), "click", 1L)))
  }

  test("sessionize splits on gaps above the threshold, per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), // 80 min gap → new session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val stats = TimeWindows.sessionStats(
        TimeWindows.sessionize(ev, "ts", "user_id", gapSeconds = 1800),
        "ts", "user_id")
      .select($"user_id", $"session_id", $"events", $"duration_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stats == Set((1L, 1L, 2L, 600L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("a gap of EXACTLY the threshold MERGES, in both sessionize and session_window") {
    // session_window merges an event landing on the previous window's end
    // (verified empirically) — sessionize's strict > mirrors that, and a
    // strictly larger gap splits in both.
    val boundary = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:30:00")) // gap == 1800 s
    ).toDF("user_id", "ts")
    assert(TimeWindows.sessionize(boundary, "ts", "user_id", gapSeconds = 1800)
      .select($"session_id").as[Long].collect().toSet == Set(1L))
    assert(TimeWindows.nativeSessions(boundary, "ts", "user_id", "30 minutes").count() == 1)

    val beyond = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:30:01")) // gap == 1801 s
    ).toDF("user_id", "ts")
    assert(TimeWindows.sessionize(beyond, "ts", "user_id", gapSeconds = 1800)
      .select($"session_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(TimeWindows.nativeSessions(beyond, "ts", "user_id", "30 minutes").count() == 2)
  }
}
