package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** T9 in streaming form: event-time tumbling window with a watermark over a
  * memory stream — the `readStream → withWatermark → window → agg` shape. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked tumbling counts over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .count()
    val query = counts.writeStream
      .format("memory").queryName("t9_stream").outputMode("update").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "click"),
        (Timestamp.valueOf("2024-01-01 11:10:00"), "view"))
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT CAST(window.start AS STRING) AS s, event_type, count FROM t9_stream")
        .as[(String, String, Long)].collect().toSet
      assert(got.contains(("2024-01-01 10:00:00", "click", 2L)))
      assert(got.contains(("2024-01-01 11:00:00", "view", 1L)))

      // Late-but-within-watermark data updates the old window.
      input.addData((Timestamp.valueOf("2024-01-01 10:50:00"), "click"))
      query.processAllAvailable()
      val updated = spark.sql(
        "SELECT count FROM t9_stream WHERE event_type = 'click' " +
        "AND CAST(window.start AS STRING) = '2024-01-01 10:00:00'")
        .as[Long].collect().max
      assert(updated == 3L)
    } finally query.stop()
  }

  test("watermarked sliding counts over a stream (width/slide overlapping windows)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .count()
    val query = counts.writeStream
      .format("memory").queryName("t9c_stream").outputMode("update").start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:05:00"), "click"))
      query.processAllAvailable()
      val starts = spark.sql(
        "SELECT CAST(window.start AS STRING) AS s FROM t9c_stream WHERE event_type = 'click'")
        .as[String].collect().toSet
      // one event → 4 overlapping windows on the 15-minute grid
      assert(starts == Set("2024-01-01 09:15:00", "2024-01-01 09:30:00",
        "2024-01-01 09:45:00", "2024-01-01 10:00:00"))
    } finally query.stop()
  }
}
