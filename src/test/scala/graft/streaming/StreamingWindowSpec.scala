package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Watermarked event-time window aggregation — the canonical Structured
  * Streaming shape (readStream → withWatermark → groupBy(window) → append):
  * a window's count is emitted exactly once, only after the watermark
  * passes its end, and events later than the watermark horizon are dropped
  * rather than corrupting an already-emitted window. State per key is one
  * partial count, evicted at watermark — bounded regardless of stream
  * length, which is what makes the shape safe on an unbounded 100 TB/day
  * ingest. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows emit once on watermark passage; too-late events are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = input.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").cast("string").as("window_start"),
        col("event_type"), col("events"))
    val query = counts.writeStream
      .format("memory").queryName("win_stream").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click"),
        (ts("2024-01-01 10:20:00"), "click"),
        (ts("2024-01-01 10:40:00"), "view"))
      query.processAllAvailable()
      // nothing final yet: watermark (10:40 - 10m = 10:30) < window end 11:00
      assert(spark.sql("SELECT * FROM win_stream").count() == 0,
        "append mode must not emit an open window")

      // advance event time past 11:00 + 10m → the 10:00 window closes
      input.addData((ts("2024-01-01 11:15:00"), "click"))
      query.processAllAvailable()
      val closed = spark.sql(
        "SELECT event_type, events FROM win_stream WHERE window_start = '2024-01-01 10:00:00'")
        .as[(String, Long)].collect().toMap
      assert(closed == Map("click" -> 2L, "view" -> 1L),
        s"closed window must carry the full pre-watermark counts, got $closed")

      // an event 75+ minutes behind the watermark targets the CLOSED window:
      // it must be dropped, not re-emit or mutate the window
      input.addData((ts("2024-01-01 10:01:00"), "click"))
      query.processAllAvailable()
      val after = spark.sql(
        "SELECT events FROM win_stream WHERE window_start = '2024-01-01 10:00:00' AND event_type = 'click'")
        .as[Long].collect().toSeq
      assert(after == Seq(2L), "late data behind the watermark is dropped")

      // The state store behind this query is genuinely RocksDB, not just
      // a conf line: the provider surfaces rocksdb* custom metrics in the
      // operator progress. Guards against the pin silently not taking
      // (e.g. a misspelled provider class falls back without failing).
      val metrics = query.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"expected RocksDB state-store metrics, got ${metrics.keySet}")
    } finally query.stop()
  }
}
