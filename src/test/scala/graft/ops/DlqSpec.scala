package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Dead-letter dataflow: dedup, due filter, backoff, state transition. */
class DlqSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-15 00:00:00")
  private def ts(s: String) = Timestamp.valueOf(s)

  test("D1: dedup keeps the earliest row per (source_key, data_hash)") {
    val df = Seq(
      (3L, "k1", "h1"), (1L, "k1", "h1"), (2L, "k1", "h2"), (5L, "k2", "h1")
    ).toDF("id", "source_key", "data_hash")
    val got = Dlq.dedup(df).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 5L))
  }

  test("P8: due filter — attempts, backoff elapsed, routable") {
    val df = Seq(
      (1L, 0, Some("e"), None),                                   // due (never tried)
      (2L, 0, Some("e"), Some(ts("2024-01-14 00:00:00"))),        // due (backoff passed)
      (3L, 0, Some("e"), Some(ts("2024-01-16 00:00:00"))),        // not due yet
      (4L, 5, Some("e"), None),                                   // attempts exhausted
      (5L, 0, None: Option[String], None)                         // unroutable
    ).toDF("id", "attempts", "environment_name", "next_attempt")
    val got = Dlq.dueFilter(df, 5, lit(t0)).select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("F3: exponential backoff doubles and caps at 6 h") {
    val df = Seq(0, 1, 5, 8, 20).toDF("attempts")
    val got = df.select(Dlq.backoffSeconds($"attempts").as("b")).as[Long].collect()
    assert(got.toSeq == Seq(60L, 120L, 1920L, 15360L, 21600L)) // 2^20 capped
  }

  test("T5: retryState bumps attempts once and parks unroutable rows a year") {
    val df = Seq(
      (1L, 1, Some("e")), (2L, 2, None: Option[String])
    ).toDF("id", "attempts", "environment_name")
    val got = Dlq.retryState(df, lit(t0)).orderBy("id")
      .select($"attempts", $"backoff_seconds").as[(Int, Long)].collect()
    assert(got(0) == ((2, 120L)))                 // 60 * 2^1 (pre-increment)
    assert(got(1) == ((3, 365L * 24 * 3600)))     // parked
  }

  test("A6: top-k offenders breaks count ties deterministically by name") {
    val df = Seq("b", "b", "a", "a", "c").map(o => (o, "x")).toDF("tracking_object_name", "e")
    val got = Dlq.topOffenders(df, 2).as[(String, Long)].collect()
    assert(got.toSeq == Seq(("a", 2L), ("b", 2L)))
  }

  test("F13: threshold status with 75% pre-warn") {
    val df = Seq(10L, 80L, 120L).toDF("n")
    val got = df.select(Dlq.thresholdStatus($"n", 100).as("s")).as[String].collect()
    assert(got.toSeq == Seq("ok", "warn", "alert"))
  }

  test("retention purge drops rows older than the cutoff") {
    val df = Seq(
      (1L, ts("2023-10-01 00:00:00")), (2L, ts("2024-01-10 00:00:00"))
    ).toDF("id", "timestamp")
    val got = Dlq.purgeExpired(df, lit(t0), 60).select("id").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }
}
