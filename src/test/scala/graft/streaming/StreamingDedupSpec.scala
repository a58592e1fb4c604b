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

  test("incremental near-dedup across 3 micro-batches equals the batch operator on the same batches") {
    import graft.ops.DedupOps
    import graft.state.ParquetStateStore
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-snd")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val survivorsDir = dir.resolve("survivors").toString

    val txtA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val txtB = "completely different second document about spark shuffle partitioning strategies and cost"
    val txtC = "a third topic entirely concerning parquet row groups and column chunk encodings"
    val txtD = "fourth unique text on watermark semantics in structured streaming state stores"
    val b1 = Seq((1L, txtA), (2L, txtB))
    // 3 = exact near-dup of batch-1's doc 1 (committed buckets reject it);
    // 4 and 5 share fresh buckets — the lower id (4) is the hub, 5 loses.
    val b2 = Seq((3L, txtA), (4L, txtC), (5L, txtC))
    // 6 re-delivers batch-1 content; 7 is genuinely new.
    val b3 = Seq((6L, txtB), (7L, txtD))

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(spark, input.toDF().toDF("doc_id", "text"),
      store, survivorsDir, dir.resolve("chk").toString)
    try {
      for (b <- Seq(b1, b2, b3)) { input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.read.parquet(survivorsDir)
      .select("doc_id").as[Long].collect().toSet

    // Batch oracle: the batch operator folded over the same batches in
    // arrival order (llm_incremental_neardedup semantics per step).
    var seen = Seq.empty[(Int, String)].toDF("band", "bucket")
    var expected = Set.empty[Long]
    for (b <- Seq(b1, b2, b3)) {
      val (s, ns) = DedupOps.incrementalNearDedup(
        b.toDF("doc_id", "text"), seen, "doc_id", "text")
      expected ++= s.select("doc_id").as[Long].collect()
      seen = ns.localCheckpoint()
    }
    assert(got == expected, s"streaming admission $got != batch oracle $expected")
    // Pin the greedy-online semantics doc-by-doc, not just the equality.
    assert(got == Set(1L, 2L, 4L, 7L),
      "committed buckets reject 3 and 6; fresh-bucket hub 4 beats batchmate 5")

    // Replay of a landed batch is a no-op: state and output are unchanged.
    val before = store.commitCount
    StreamingDedup.admitBatch(store, b3.toDF("doc_id", "text"), 2L,
      survivorsDir, "doc_id", "text", 8, 4)
    assert(store.commitCount == before, "replayed batch must not recommit state")
    assert(spark.read.parquet(survivorsDir).select("doc_id").as[Long].collect().toSet == got)
  }
}
