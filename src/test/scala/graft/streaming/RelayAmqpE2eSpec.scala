package graft.streaming

import graft.SparkSpec
import graft.model.{EnvironmentConfig, SinkEndpoint, TrackingObject}
import graft.sinks.AmqpLoopback
import graft.state.ParquetStateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end AMQP export over the in-JVM loopback broker (K3 at wire
  * level — the RelayHttpE2eSpec precedent): the relay's executor-side
  * fan-out performs REAL AMQP 0-9-1 publishes, and the spec asserts the
  * frames — exchange, per-object routing key, correlation id = batch
  * group (replayable), persistent delivery, headers table, envelope
  * bodies. Then the broker dies and the failures dead-letter. */
class RelayAmqpE2eSpec extends SparkSpec {
  import spark.implicits._

  private def outboxDf(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("id", "xact_id", "operation", "value", "props")
      .select($"id", $"xact_id", $"operation", $"value", $"props",
        lit(null).cast("array<string>").as("changed"))

  test("export publishes real AMQP frames; dead broker dead-letters") {
    val broker = new AmqpLoopback.Server()
    val dir = Files.createTempDirectory("graft-amqp-e2e")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val obj = TrackingObject("orders", "db0", "t_orders", "sp_orders")
    val endpoint = SinkEndpoint("mq1", "rabbitmq",
      s"amqp://127.0.0.1:${broker.port}/graft.export",
      headers = Map("HostName" -> "127.0.0.1", "schema" -> "dbo"))
    val config = EnvironmentConfig("prod", "postgres", Seq(obj), Seq(endpoint),
      maxRecordsPerBatch = 1)
    val relay = new ChangeRelay(spark, store, config,
      horizonOf = _ => 1000L, performAmqp = true)
    store.setWatermark("prod", "orders", 0L)

    val (n1, v1) = relay.runCycle(obj, outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (2L, 11L, "U", 2.5, """{"k":2}"""))), "20240115000000")
    assert(n1 == 2 && v1 == 2L)
    // two envelopes → two real publishes (poll briefly: the broker thread
    // appends after the relay's task returns)
    var seen = broker.snapshot
    val deadline = System.currentTimeMillis() + 5000
    while (seen.size < 2 && System.currentTimeMillis() < deadline) {
      Thread.sleep(50); seen = broker.snapshot
    }
    assert(seen.size == 2, s"expected 2 publishes, got ${seen.size}")
    seen.foreach { s =>
      assert(s.exchange == "graft.export")
      assert(s.routingKey == "db0.orders", "routing key = database.object")
      assert(s.deliveryMode == 2, "persistent delivery on the wire")
      assert(s.contentType == "application/json")
      assert(s.headers == Map("HostName" -> "127.0.0.1", "schema" -> "dbo"))
      assert(s.body.nonEmpty && s.bodySizeDeclared == s.body.length)
    }
    val bodies = seen.map(s => new String(s.body, "UTF-8"))
    assert(bodies.forall(_.contains("\"$operation\"")), "envelope JSON on the wire")
    assert(Seq(1L, 2L).forall(v => bodies.exists(_.contains(s"\"Version\":$v"))))
    // correlation id = batch group key, distinct per envelope (replayable)
    assert(seen.map(_.correlationId).distinct.size == 2)
    assert(seen.forall(_.correlationId.contains("#")), "group key carries the batch number")
    assert(store.deadLetters.isEmpty)

    // dead broker → ExportFailure → DLQ (at-least-once: watermark advances)
    broker.stop()
    val (n2, v2) = relay.runCycle(obj, outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (3L, 12L, "U", 3.5, """{"k":3}"""))), "20240115000100")
    assert(n2 == 1 && v2 == 3L)
    val letters = store.deadLetters.select("error_message", "data")
      .as[(String, String)].collect()
    assert(letters.length == 1, s"failed publish must dead-letter: ${letters.toSeq}")
    assert(letters.head._2.contains("\"Version\":3"))
  }
}
