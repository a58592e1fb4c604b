package graft.streaming

import graft.SparkSpec
import graft.state.ParquetStateStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance: the per-batch fold over closed+open state
  * must reconstruct EXACTLY the one-shot interval table, survive replays,
  * and keep the tri-state delete discipline. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(("a", 1L, "I"), ("b", 2L, "I"), ("a", 5L, "U"))
  private val b2 = Seq(("c", 10L, "I"), ("a", 12L, "U"))
  private val b3 = Seq(("c", 20L, "D"), ("a", 25L, "U"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Option[Long], String, Boolean)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getString(3), r.getBoolean(4))).toSet

  test("3-batch streaming fold equals the one-shot scd2Intervals reconstruction") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val closedDir = dir.resolve("closed").toString

    val input = MemoryStream[(String, Long, String)]
    val q = StreamingScd2.start(spark, input.toDF().toDF("k", "id", "op"),
      store, closedDir, dir.resolve("chk").toString)
    try {
      for (b <- Seq(b1, b2, b3)) { input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = rows(StreamingScd2.intervals(spark, store, closedDir))
    val oneShot = rows(graft.ops.Incremental.scd2Intervals(
        (b1 ++ b2 ++ b3).toDF("k", "id", "op"), "k", "id", "op")
      .select(col("k"), col("valid_from"), col("valid_to"), col("op"),
        col("is_current")))
    assert(got == oneShot, s"fold $got != one-shot $oneShot")

    // Tri-state discipline, pinned explicitly and not just by equality:
    // b's only version is current; c's tombstone interval EXISTS but is
    // not current (deleted != never-existed); a's last update is current.
    assert(got.contains(("b", 2L, None, "I", true)))
    assert(got.contains(("c", 20L, None, "D", false)))
    assert(got.contains(("a", 25L, None, "U", true)))
    assert(got.contains(("a", 5L, Some(12L), "U", false)),
      "a cross-batch close must use the key's first id of the NEXT batch")

    // Replay of a landed batch: no state commit, closed dirs unchanged.
    val before = store.commitCount
    StreamingScd2.applyBatch(store, b3.toDF("k", "id", "op"), 2L, closedDir)
    assert(store.commitCount == before, "replayed batch must not recommit")
    assert(rows(StreamingScd2.intervals(spark, store, closedDir)) == oneShot)
  }

  test("randomized batch splits: any fold of a monotone change stream equals the one-shot") {
    // Global increasing ids with random keys/ops keep per-key monotonicity
    // under ANY batch boundary — the CDC contract. Random splits hunt the
    // boundary cases the handcrafted scenario can't: a key changing many
    // times inside one batch, a key absent from whole batches, deletes
    // closing across a split, single-event batches.
    val rnd = new scala.util.Random(20260815L)
    val keys = Vector("a", "b", "c", "d", "e")
    val ops = Vector("I", "U", "D")
    for (trial <- 1 to 3) {
      val events = (1L to 30L).map(id =>
        (keys(rnd.nextInt(keys.length)), id * 7, ops(rnd.nextInt(ops.length))))
      val cuts = (Seq(0, events.length) ++
        Seq.fill(rnd.nextInt(4))(rnd.nextInt(events.length))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => events.slice(a, b) }
        .filter(_.nonEmpty)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scd2p$trial")
      val store = new ParquetStateStore(spark, dir.resolve("state").toString)
      val closedDir = dir.resolve("closed").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingScd2.applyBatch(store, b.toDF("k", "id", "op"), i.toLong, closedDir)
      }
      val got = rows(StreamingScd2.intervals(spark, store, closedDir))
      val oneShot = rows(graft.ops.Incremental.scd2Intervals(
          events.toDF("k", "id", "op"), "k", "id", "op")
        .select(col("k"), col("valid_from"), col("valid_to"), col("op"),
          col("is_current")))
      assert(got == oneShot,
        s"trial $trial (${batches.map(_.length)} split): fold != one-shot")
    }
  }

  test("open state is one row per live key (compact), not history-scale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2c")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val closedDir = dir.resolve("closed").toString
    StreamingScd2.applyBatch(store, b1.toDF("k", "id", "op"), 0L, closedDir)
    StreamingScd2.applyBatch(store, b2.toDF("k", "id", "op"), 1L, closedDir)
    StreamingScd2.applyBatch(store, b3.toDF("k", "id", "op"), 2L, closedDir)
    val open = StreamingScd2.openIntervals(store)
      .as[(String, Long, String)].collect().toSet
    assert(open == Set(("a", 25L, "U"), ("b", 2L, "I"), ("c", 20L, "D")),
      "exactly one open interval per ever-seen key")
  }
}
