package graft.streaming

import graft.SparkSpec
import graft.ops.Funnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pins [[FunnelStream]]: per-user funnel state advances across
  * micro-batches, converted users drop their state, and under in-order
  * arrival the stream's final step counts equal the batch
  * [[Funnel.funnelSteps]] fold over the union of all batches. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  import FunnelStream._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val steps = Seq("signup", "view", "purchase")

  test("streaming transitions across batches equal the batch lead-window counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val query = transitions(input.toDS()).writeStream
      .format("memory").queryName("trans_stream").outputMode("append").start()
    val b1 = Seq(
      FunnelEvent(1L, ts(100L), "a"), FunnelEvent(1L, ts(200L), "b"),
      FunnelEvent(2L, ts(100L), "a"))
    val b2 = Seq( // u1's state (last=b) carries across the batch boundary
      FunnelEvent(1L, ts(300L), "c"), FunnelEvent(2L, ts(400L), "a"))
    try {
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      val got = spark.sql("SELECT fromType, toType FROM trans_stream")
        .as[(String, String)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val all = (b1 ++ b2).map(e => (e.userId, e.ts, e.eventType))
        .zipWithIndex.map { case ((u, t, y), i) => (i.toLong, t, u, y) }
        .toDF("event_id", "ts", "user_id", "event_type")
      val want = Funnel.transitionCounts(all, "ts", "user_id", "event_type", "event_id")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want, s"stream $got vs batch $want")
      assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "a") -> 1L))
    } finally query.stop()
  }

  test("funnel state survives a query restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    // the memory sink refuses checkpoint recovery, so this test writes to
    // a durable parquet sink — the restart path a real deployment uses
    val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("funnel-out").toString
    val input = MemoryStream[FunnelEvent]
    def start() = advance(input.toDS(), steps, windowSeconds = 500L)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      input.addData(FunnelEvent(5L, ts(100L), "signup"),
        FunnelEvent(5L, ts(200L), "view"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: the purchase can only advance to
    // step 3 if t1/t2 were restored from the state store
    val q2 = start()
    try {
      input.addData(FunnelEvent(5L, ts(300L), "purchase"))
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("userId", "stepReached", "t1", "tLast")
        .as[(Long, Int, Long, Long)].collect().toSet
      assert(got === Set((5L, 2, 100L, 200L), (5L, 3, 100L, 300L)),
        s"state must survive the restart: $got")
    } finally q2.stop()
  }

  test("streaming sessions stitch across batches and equal the batch sessionize rollup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val query = sessions(input.toDS(), gapSeconds = 1800L,
      watermarkDelay = "0 seconds").writeStream
      .format("memory").queryName("sess_stream").outputMode("append").start()
    // u1's session SPANS the batch boundary (gap 1000 ≤ 1800 across
    // batches — the state store must merge); the exact-gap event (1800)
    // stays in-session, 1801 opens a new one. u2 is a lone event.
    val b1 = Seq(
      SessionEvent(1L, ts(0L), "view", 1.23),
      SessionEvent(1L, ts(1000L), "click", 2.00),
      SessionEvent(2L, ts(500L), "view", 0.0))
    val b2 = Seq(
      SessionEvent(1L, ts(2800L), "view", 0.50),
      SessionEvent(1L, ts(4601L), "purchase", 10.99))
    try {
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      // sentinel batches only advance the watermark (emission happens in
      // the batch AFTER the one whose max event time passes session end)
      input.addData(SessionEvent(99L, ts(100000L), "view", 0.0))
      query.processAllAvailable()
      input.addData(SessionEvent(99L, ts(200000L), "view", 0.0))
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT * FROM sess_stream WHERE user_id <> 99")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val all = (b1 ++ b2).zipWithIndex.map { case (e, i) =>
        (i.toLong, e.ts, e.userId, e.eventType, e.value)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val want = Funnel.sessionize(all, "ts", "user_id", "event_type",
          "value", "event_id")
        .select("user_id", "n_events", "start_s", "end_s", "duration_s",
          "n_types", "rev_cents")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === want, s"stream $got vs batch $want")
      // and the batch reference itself is the hand-computed truth
      assert(want === Set(
        (1L, 3L, 0L, 2800L, 2800L, 2L, 373L),
        (1L, 1L, 4601L, 4601L, 0L, 1L, 1099L),
        (2L, 1L, 500L, 500L, 0L, 1L, 0L)))
    } finally query.stop()
  }

  test("streaming attribution across batches equals the batch window form; state spans sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val query = attribution(input.toDS(), convType = "purchase")
      .writeStream.format("memory").queryName("att_stream")
      .outputMode("append").start()
    // u1's session spans the batch boundary: view (b1) then click/purchase
    // (b2) -> credit (view, click); u2's later purchase opens its own
    // session -> (purchase, (direct)). Times sit WELL past epoch 0: a row
    // whose event time equals the initial watermark (0) is dropped as
    // late by flatMapGroupsWithState (numRowsDroppedByWatermark=1 —
    // verified), unlike the windowed-aggregation path which drops by
    // window end.
    val base = 100000L
    val b1 = Seq(
      FunnelEvent(1L, ts(base), "view"),
      FunnelEvent(2L, ts(base), "view"))
    val b2 = Seq(
      FunnelEvent(1L, ts(base + 1000L), "click"),
      FunnelEvent(1L, ts(base + 1200L), "purchase"),
      FunnelEvent(2L, ts(base + 5000L), "purchase"))
    try {
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      val got = spark.sql("SELECT firstTouch, lastTouch FROM att_stream")
        .as[(String, String)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val all = (b1 ++ b2).zipWithIndex.map { case (e, i) =>
        (i.toLong, e.ts, e.userId, e.eventType)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val want = Funnel.attribution(all, "ts", "user_id", "event_type",
          "event_id", convType = "purchase")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want, s"stream $got vs batch $want")
      assert(got === Map(("view", "click") -> 1L, ("purchase", "(direct)") -> 1L))
    } finally query.stop()
  }

  test("funnel state advances across batches and matches the batch fold in-order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val query = advance(input.toDS(), steps, windowSeconds = 500L).writeStream
      .format("memory").queryName("funnel_stream").outputMode("append").start()
    val b1 = Seq(
      FunnelEvent(1L, ts(100L), "signup"), FunnelEvent(1L, ts(200L), "view"),
      FunnelEvent(2L, ts(100L), "signup"),
      FunnelEvent(3L, ts(100L), "view")) // never signs up first
    val b2 = Seq(
      FunnelEvent(1L, ts(300L), "purchase"), // completes across batches
      FunnelEvent(2L, ts(90L), "view"),      // late: before signup, ignored
      FunnelEvent(2L, ts(700L), "view"))     // past the 500 s window
    try {
      input.addData(b1: _*); query.processAllAvailable()
      input.addData(b2: _*); query.processAllAvailable()
      val updates = spark.sql(
        "SELECT userId, stepReached, t1, tLast FROM funnel_stream")
        .as[(Long, Int, Long, Long)].collect()
      // u1 advanced in both batches (2 then 3); u2 only its signup batch
      assert(updates.toSet === Set(
        (1L, 2, 100L, 200L), (1L, 3, 100L, 300L), (2L, 1, 100L, 100L)))

      // final furthest-step counts == batch fold over the union
      val finalStep = updates.groupBy(_._1).view.mapValues(_.map(_._2).max)
      val streamCounts = steps.indices.map(i =>
        finalStep.values.count(_ >= i + 1).toLong)
      val all = (b1 ++ b2).map(e => (e.userId, e.ts, e.eventType))
        .toDF("user_id", "ts", "event_type")
      val batchCounts = Funnel.funnelSteps(all, "ts", "user_id", "event_type",
          steps, 500L)
        .orderBy(col("step_idx")).as[(Int, String, Long)].collect().map(_._3).toSeq
      assert(streamCounts === batchCounts)
    } finally query.stop()
  }
}
