package graft.streaming

import graft.SparkSpec
import graft.model.{EnvironmentConfig, SinkEndpoint, TrackingObject}
import graft.state.ParquetStateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** SURVEY §7.2 minimum end-to-end slice: outbox → incremental read →
  * envelope → templated file sink → watermark advance; a second cycle picks
  * up only new rows; a delete round-trips; sink failures dead-letter and
  * replay; pause holds; reset re-syncs. */
class RelaySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): Path = Files.createTempDirectory("graft-relay")

  private def outboxDf(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("id", "xact_id", "operation", "value", "props")
      .select($"id", $"xact_id", $"operation",
        when($"operation" =!= "D", $"value").as("value"),
        when($"operation" =!= "D", $"props").as("props"),
        lit(null).cast("array<string>").as("changed"))

  private val obj = TrackingObject("orders", "db0", "t_orders", "sp_orders")
  private def cfg(sinks: Seq[SinkEndpoint] = Nil) = EnvironmentConfig(
    name = "prod", provider = "postgres",
    trackingObjects = Seq(obj), endpoints = sinks)

  test("end-to-end slice: export, watermark advance, second run incremental, delete round-trips") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val exportTpl = dir.resolve("exports").toString +
      "/{environment}/{object}/changes-{timestamp}-{batch}.json"
    val relay = new ChangeRelay(spark, store, cfg(), Some(exportTpl),
      horizonOf = _ => 1000L)

    store.setWatermark("prod", "orders", 0L)
    val cycle1 = outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (2L, 11L, "U", 2.5, """{"k":2}"""),
      (3L, 2000L, "U", 9.9, """{"k":9}"""))) // in-flight: beyond horizon
    val (n1, v1) = relay.runCycle(obj, cycle1, "20240115000000")
    assert(n1 == 2 && v1 == 2L) // in-flight row deferred from rows AND watermark

    val written = Files.walk(dir.resolve("exports")).filter(Files.isRegularFile(_))
      .map[String](_.toString).toArray
    assert(written.length == 1)
    val content = Files.readString(java.nio.file.Paths.get(written(0).toString))
    assert(content.contains("\"Version\": 2") && content.contains("$operation"))

    // Cycle 2: the deferred row is now committed + one delete arrives.
    val cycle2 = outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (2L, 11L, "U", 2.5, """{"k":2}"""),
      (3L, 2000L, "U", 9.9, """{"k":9}"""),
      (4L, 2001L, "D", 0.0, null)))
    val relay2 = new ChangeRelay(spark, store, cfg(), Some(exportTpl), horizonOf = _ => 3000L)
    val (n2, v2) = relay2.runCycle(obj, cycle2, "20240115000100")
    assert(n2 == 2 && v2 == 4L) // ONLY the deferred row + the delete
    val all = Files.walk(dir.resolve("exports")).filter(Files.isRegularFile(_)).count()
    assert(all == 2)
    val second = Files.walk(dir.resolve("exports")).filter(Files.isRegularFile(_))
      .map[String](p => Files.readString(p)).toArray.map(_.toString)
      .find(_.contains("\"Version\": 4")).get
    assert(second.contains("\"$operation\": \"D\"")) // delete survived to the sink
    assert(store.getWatermark("prod", "orders").contains(4L))
  }

  test("batched multi-object cycle: ONE watermark commit, per-object semantics unchanged") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val objs = (0 until 5).map(i => TrackingObject(s"o$i", "db0", "t", "sp"))
    val fresh = TrackingObject("o5fresh", "db0", "t", "sp") // no watermark → seed path
    val config = EnvironmentConfig("prod", "postgres", objs :+ fresh, Nil)
    val exportTpl = dir.resolve("exports").toString + "/{object}/c-{batch}.json"
    val relay = new ChangeRelay(spark, store, config, Some(exportTpl),
      horizonOf = _ => 1000L)
    store.setWatermarks(objs.map(o => ("prod", o.name, 0L)))
    store.pause("obj:prod/o3", "maintenance", "ops")

    val base = store.commitCount
    val feeds = objs.zipWithIndex.map { case (o, i) =>
      o -> outboxDf(Seq((i + 1L, 10L, "I", 1.0, s"""{"k":$i}""")))
    } :+ (fresh -> outboxDf(Seq((7L, 10L, "I", 7.0, """{"k":7}"""), (8L, 11L, "U", 8.0, """{"k":8}"""))))
    val res = relay.runCycles(feeds, "20240115000000")

    // The whole cycle's advances — four exports + one seed — land in ONE
    // snapshot commit; per-object runCycle would have committed five times.
    assert(store.commitCount == base + 1,
      s"expected one commit for the cycle, got ${store.commitCount - base}")
    assert(res("o3") == (0L, 0L), "paused object must hold")
    for (i <- Seq(0, 1, 2, 4))
      assert(res(s"o$i") == (1L, i + 1L), s"o$i exported its row and advanced")
    assert(res("o5fresh") == (0L, 8L), "seed records the frontier, emits nothing")
    for (i <- Seq(0, 1, 2, 4))
      assert(store.getWatermark("prod", s"o$i").contains(i + 1L))
    assert(store.getWatermark("prod", "o3").contains(0L))
    assert(store.getWatermark("prod", "o5fresh").contains(8L))
  }

  test("at-least-once: failed sink dead-letters but the watermark still advances") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val failingHttp = SinkEndpoint("ep1", "http", "http://x/{object}",
      enableCompression = false)
    // 5-byte payload cap → every post fails → DLQ.
    val relay = new ChangeRelay(spark, store,
      cfg(Seq(failingHttp)).copy(maxPayloadSizeBytes = 5L),
      None, horizonOf = _ => 1000L)
    store.setWatermark("prod", "orders", 0L)
    val (_, v) = relay.runCycle(obj,
      outboxDf(Seq((1L, 1L, "I", 1.0, """{"k":1}"""))), "20240115000000")
    assert(v == 1L)
    assert(store.getWatermark("prod", "orders").contains(1L)) // advanced anyway
    assert(store.deadLetters.count() == 1)

    // T4: the same failure again is idempotent (D1 dedup).
    val relayAgain = new ChangeRelay(spark, store,
      cfg(Seq(failingHttp)).copy(maxPayloadSizeBytes = 5L), None, horizonOf = _ => 1000L)
    store.resetWatermark("prod", "orders")
    store.setWatermark("prod", "orders", 0L)
    relayAgain.runCycle(obj, outboxDf(Seq((1L, 1L, "I", 1.0, """{"k":1}"""))), "20240115000000")
    assert(store.deadLetters.count() == 1)

    // T5/replay: endpoint recovers → row deleted from DLQ.
    val (ok, bad) = relay.replayCycle(_ => true, java.sql.Timestamp.valueOf("2024-01-15 01:00:00"))
    assert(ok == 1 && bad == 0)
    assert(store.deadLetters.count() == 0)
  }

  test("broker endpoints participate in the fan-out: a guard failure dead-letters") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    // Missing required connection field → prepareBrokerMessage fails →
    // the failure must dead-letter (previously broker kinds were silently
    // skipped while the watermark advanced: data loss with no DLQ row).
    val broken = SinkEndpoint("mq1", "rabbitmq", "", headers = Map("HostName" -> ""))
    val relay = new ChangeRelay(spark, store, cfg(Seq(broken)), None,
      horizonOf = _ => 1000L)
    store.setWatermark("prod", "orders", 0L)
    val (_, v) = relay.runCycle(obj,
      outboxDf(Seq((1L, 1L, "I", 1.0, """{"k":1}"""))), "20240115000000")
    assert(v == 1L && store.getWatermark("prod", "orders").contains(1L))
    assert(store.deadLetters.count() == 1, "broker guard failure must dead-letter")
    val err = store.deadLetters.select("error_message").collect().head.getString(0)
    assert(err.contains("missing required fields"))
  }

  test("replay failure widens backoff and bumps attempts") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val rows = Seq(("k1", "orders", "prod", "db0", "h1", "{}", "boom"))
      .toDF("source_key", "tracking_object_name", "environment_name",
        "database_name", "data_hash", "data", "error_message")
      .withColumn("timestamp", current_timestamp())
    store.appendDeadLetters(rows)
    val relay = new ChangeRelay(spark, store, cfg(), None)
    val (ok, bad) = relay.replayCycle(_ => false, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    assert(ok == 0 && bad == 1)
    val row = store.deadLetters.head()
    assert(row.getAs[Int]("attempts") == 1)
    assert(row.getAs[java.sql.Timestamp]("next_attempt")
      .equals(java.sql.Timestamp.valueOf("2024-01-15 00:01:00"))) // 60*2^0: first failure waits one base delay
  }

  test("replay purges letters past retention before attempting anything") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val old = java.sql.Timestamp.valueOf("2023-10-01 00:00:00")   // > 60 days before now
    val freshTs = java.sql.Timestamp.valueOf("2024-01-14 00:00:00") // 1 day before now
    val rows = Seq(
      ("k-old", "orders", "prod", "db0", "h-old", "{}", "boom", old),
      ("k-new", "orders", "prod", "db0", "h-new", "{}", "boom", freshTs))
      .toDF("source_key", "tracking_object_name", "environment_name",
        "database_name", "data_hash", "data", "error_message", "timestamp")
    store.appendDeadLetters(rows)
    assert(store.deadLetters.count() == 2)

    val attempted = scala.collection.mutable.ArrayBuffer[String]()
    val relay = new ChangeRelay(spark, store, cfg(), None)
    val (ok, bad) = relay.replayCycle(
      k => { attempted += k; true }, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    // The expired letter was purged, never attempted; the fresh one replayed.
    assert(!attempted.contains("k-old"), "expired letter must not be re-attempted")
    assert(ok == 1 && bad == 0)
    assert(store.deadLetters.count() == 0)
  }

  test("pause holds the object; resume releases it; reset re-seeds") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val relay = new ChangeRelay(spark, store, cfg(), None, horizonOf = _ => 100L)
    val changes = outboxDf(Seq((1L, 1L, "I", 1.0, "{}"), (2L, 2L, "U", 2.0, "{}")))

    store.setWatermark("prod", "orders", 0L)
    store.pause("env:prod", "maintenance", "ops")
    val (n, _) = relay.runCycle(obj, changes, "20240115000000")
    assert(n == 0) // held
    store.resume("env:prod")
    val (n2, _) = relay.runCycle(obj, changes, "20240115000000")
    assert(n2 == 2)

    // T8 — delete the watermark: Incremental mode seeds at the frontier.
    store.resetWatermark("prod", "orders")
    val (n3, v3) = relay.runCycle(obj, changes, "20240115000000")
    assert(n3 == 0 && v3 == 2L) // seeded, nothing emitted
    assert(store.getWatermark("prod", "orders").contains(2L))
  }

  test("watermark never regresses when a late micro-batch carries only old ids") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val relay = new ChangeRelay(spark, store, cfg(), None, horizonOf = _ => 1000L)
    store.setWatermark("prod", "orders", 10L)
    // A replayed/old file surfaces rows 5-6 after the watermark reached 10.
    val late = outboxDf(Seq((5L, 5L, "I", 1.0, "{}"), (6L, 6L, "U", 2.0, "{}")))
    val (n, v) = relay.runCycle(obj, late, "20240115000000")
    assert(n == 0 && v == 10L)
    assert(store.getWatermark("prod", "orders").contains(10L)) // not regressed to 6
  }

  test("multiple sinks failing on one payload produce exactly one dead letter") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val eps = Seq(
      SinkEndpoint("ep1", "http", "http://a/{object}"),
      SinkEndpoint("ep2", "http", "http://b/{object}"))
    val relay = new ChangeRelay(spark, store,
      cfg(eps).copy(maxPayloadSizeBytes = 5L), None, horizonOf = _ => 1000L)
    store.setWatermark("prod", "orders", 0L)
    relay.runCycle(obj, outboxDf(Seq((1L, 1L, "I", 1.0, """{"k":1}"""))), "20240115000000")
    assert(store.deadLetters.count() == 1) // both endpoint failures collapse (D1)
  }

  test("a 10k-envelope cycle fans out on executors, never materializing payloads on the driver") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    // cap=1 record/batch → one envelope per row → 10,000 envelopes. A
    // successful (large-cap) http endpoint exercises the full guard path.
    val ok = SinkEndpoint("ep1", "http", "http://x/{object}/{batch}")
    val relay = new ChangeRelay(spark, store,
      cfg(Seq(ok)).copy(maxRecordsPerBatch = 1), None, horizonOf = _ => 100000L)
    store.setWatermark("prod", "orders", 0L)
    val big = outboxDf((1L to 10000L).map(i => (i, i, "I", i.toDouble, s"""{"k":$i}""")))
    val (n, v) = relay.runCycle(obj, big, "20240115000000")
    assert(n == 10000L && v == 10000L)
    // The distributed-export invariant: every envelope was fanned out INSIDE
    // a Spark task (TaskContext present) — a driver-side collect loop would
    // leave this at 0.
    assert(relay.lastCycleExecutorEnvelopes == 10000L,
      s"expected 10000 executor-side envelope exports, saw ${relay.lastCycleExecutorEnvelopes}")
    assert(store.deadLetters.count() == 0)
  }

  test("state store: snapshot commit survives re-read and GC keeps history bounded") {
    val dir = tmp()
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    (1 to 5).foreach(i => store.setWatermark("e", "o", i.toLong))
    assert(store.getWatermark("e", "o").contains(5L))
    val versions = Files.list(dir.resolve("state").resolve("watermarks"))
      .filter(Files.isDirectory(_)).count()
    assert(versions <= 2) // current + one predecessor
  }
}
