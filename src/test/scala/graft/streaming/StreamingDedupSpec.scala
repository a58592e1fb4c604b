package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming ingest dedup: `dropDuplicatesWithinWatermark` on the content
  * hash — the shape a continuous training-data ingest uses so re-delivered
  * documents (at-least-once upstream) are emitted exactly once while state
  * stays bounded by the watermark horizon. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("re-delivered documents are emitted once; state is keyed by content hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = input.toDF().toDF("ts", "doc_id", "text")
      .withWatermark("ts", "1 hour")
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_hash")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "alpha"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "beta"),
        (Timestamp.valueOf("2024-01-01 10:02:00"), 3L, "alpha")) // dup content
      query.processAllAvailable()
      // redelivery in a later batch, still within the watermark
      input.addData((Timestamp.valueOf("2024-01-01 10:10:00"), 4L, "beta"))
      query.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dedup_stream")
        .as[String].collect().toList
      assert(texts.sorted == List("alpha", "beta"),
        s"each distinct content must be emitted exactly once, got $texts")
    } finally query.stop()
  }
}
