package graft.streaming

import graft.SparkSpec
import graft.state.ParquetStateStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming crawl frontier: the per-batch fold must equal the one-shot
  * crawlSchedule when candidates arrive id-ascending, enforce the
  * per-domain cap ACROSS batches, and survive replays. */
class StreamingFrontierSpec extends SparkSpec {
  import spark.implicits._

  private def mkDirs() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-frontier")
    (new ParquetStateStore(spark, dir.resolve("state").toString),
      dir.resolve("out").toString, dir.resolve("chk").toString, dir)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long)] =
    df.select("domain", "doc_id", "slot", "sched_s")
      .as[(String, Long, Long, Long)].collect().toSet

  test("3-batch id-ascending fold equals the one-shot crawlSchedule; cap binds " +
    "across batches") {
    implicit val sqlCtx = spark.sqlContext
    val (store, outDir, chk, _) = mkDirs()
    // a: 5 candidates across batches (cap 3 → 2 dropped, one per later
    // batch); b: 2 candidates; c appears only in batch 3
    val b1 = Seq(("a.com", 10L), ("a.com", 11L), ("b.com", 20L))
    val b2 = Seq(("a.com", 12L), ("a.com", 13L))
    val b3 = Seq(("a.com", 14L), ("b.com", 21L), ("c.com", 30L))

    val input = MemoryStream[(String, Long)]
    val q = StreamingFrontier.start(spark, input.toDF().toDF("domain", "doc_id"),
      store, outDir, chk, maxPerDomain = 3, delaySec = 7)
    try {
      for (b <- Seq(b1, b2, b3)) { input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = rows(StreamingFrontier.schedule(spark, outDir))
    val oneShot = rows(graft.ops.UrlOps.crawlSchedule(
      (b1 ++ b2 ++ b3).toDF("domain", "doc_id"), "domain", "doc_id",
      startTs = "2024-01-15 00:00:00", maxPerDomain = 3, delaySec = 7))
    assert(got == oneShot, s"fold $got != one-shot $oneShot")
    // the cap bound explicitly: a.com took slots 0,1 in batch 1 and slot 2
    // in batch 2; batch-2 id 13 and batch-3 id 14 were dropped forever
    assert(got.count(_._1 == "a.com") == 3)
    assert(got.contains(("a.com", 12L, 2L, 14L)))
    assert(!got.exists(r => r._2 == 13L || r._2 == 14L))
    // c.com starts fresh at slot 0 in its first batch
    assert(got.contains(("c.com", 30L, 0L, 0L)))
  }

  test("replay of a landed batch: no recommit, schedule unchanged") {
    val (store, outDir, _, _) = mkDirs()
    val b1 = Seq(("a.com", 1L), ("a.com", 2L)).toDF("domain", "doc_id")
    val b2 = Seq(("a.com", 3L)).toDF("domain", "doc_id")
    assert(StreamingFrontier.applyBatch(store, b1, 0L, outDir, 2, 5) == 2L)
    assert(StreamingFrontier.applyBatch(store, b2, 1L, outDir, 2, 5) == 0L,
      "cap already consumed: batch 2 schedules nothing")
    val before = (store.commitCount, rows(StreamingFrontier.schedule(spark, outDir)))
    assert(StreamingFrontier.applyBatch(store, b1, 0L, outDir, 2, 5) == 0L)
    assert(store.commitCount == before._1, "replayed batch must not recommit")
    assert(rows(StreamingFrontier.schedule(spark, outDir)) == before._2)
  }

  test("randomized contiguous splits: any id-ascending fold equals the one-shot") {
    val rnd = new scala.util.Random(83)
    (1 to 3).foreach { trial =>
      val (store, outDir, _, _) = mkDirs()
      val all = (1 to 60).map(i =>
        (s"d${rnd.nextInt(5)}.com", (i * 10 + rnd.nextInt(7)).toLong)).distinct
        .sortBy(_._2)
      // contiguous ascending split into 2-5 chunks
      val cuts = (Seq(0, all.size) ++ Seq.fill(rnd.nextInt(3) + 1)(
        rnd.nextInt(all.size))).distinct.sorted
      val chunks = cuts.zip(cuts.tail).map { case (a, b) => all.slice(a, b) }
        .filter(_.nonEmpty)
      chunks.zipWithIndex.foreach { case (c, i) =>
        StreamingFrontier.applyBatch(store, c.toDF("domain", "doc_id"), i.toLong,
          outDir, maxPerDomain = 4, delaySec = 3)
      }
      val got = rows(StreamingFrontier.schedule(spark, outDir))
      val oneShot = rows(graft.ops.UrlOps.crawlSchedule(
        all.toDF("domain", "doc_id"), "domain", "doc_id",
        startTs = "2024-01-15 00:00:00", maxPerDomain = 4, delaySec = 3))
      assert(got == oneShot, s"trial $trial: $got != $oneShot")
    }
  }
}
