package graft.streaming

import graft.SparkSpec
import graft.model.{EnvironmentConfig, SinkEndpoint, TrackingObject}
import graft.sinks.Sinks
import graft.state.ParquetStateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.io.ByteArrayInputStream
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.zip.GZIPInputStream
import scala.collection.mutable.ArrayBuffer

/** End-to-end HTTP export over a real loopback server (JDK
  * com.sun.net.httpserver — no added dependency): the relay's executor-side
  * fan-out POSTs for real, and the spec asserts the WIRE bytes — auth
  * header, batch headers, gzip body — then kills the server, watches the
  * failures dead-letter, and replays the STORED envelope data against a
  * revived server until the DLQ drains. Mirrors ExportService.cs:199-331
  * (request shape) and DeadLetterReplayer.cs:49-72 (replay posts the stored
  * Data). */
class RelayHttpE2eSpec extends SparkSpec {
  import spark.implicits._

  private final case class Received(path: String, headers: Map[String, String], body: Array[Byte])

  /** Loopback server recording every request; responds 200. */
  private def startServer(port: Int, sink: ArrayBuffer[Received]): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = ex.getRequestBody.readAllBytes()
        val headers = {
          val it = ex.getRequestHeaders.entrySet().iterator()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.get(0) }
          b.result()
        }
        sink.synchronized { sink += Received(ex.getRequestURI.getPath, headers, body) }
        ex.sendResponseHeaders(200, 0)
        ex.getResponseBody.close()
      }
    })
    server.start()
    server
  }

  private def gunzip(bytes: Array[Byte]): String =
    new String(new GZIPInputStream(new ByteArrayInputStream(bytes)).readAllBytes(), "UTF-8")

  private def outboxDf(rows: Seq[(Long, Long, String, Double, String)]): DataFrame =
    rows.toDF("id", "xact_id", "operation", "value", "props")
      .select($"id", $"xact_id", $"operation", $"value", $"props",
        lit(null).cast("array<string>").as("changed"))

  test("export POSTs for real: auth + batch headers and gzip body on the wire; kill → DLQ → replay drains") {
    val received = ArrayBuffer.empty[Received]
    val server = startServer(0, received)
    val port = server.getAddress.getPort
    val dir = Files.createTempDirectory("graft-http-e2e")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val obj = TrackingObject("orders", "db0", "t_orders", "sp_orders")
    val endpoint = SinkEndpoint("ep1", "http",
      s"http://127.0.0.1:$port/ingest/{object}/{batch}",
      enableCompression = true,
      headers = Map("Authorization" -> "Bearer sekrit-token"))
    val config = EnvironmentConfig("prod", "postgres", Seq(obj), Seq(endpoint),
      maxRecordsPerBatch = 1) // one envelope per row → exact counts below
    val relay = new ChangeRelay(spark, store, config,
      horizonOf = _ => 1000L, performHttp = true)
    store.setWatermark("prod", "orders", 0L)

    // ---- phase A: live server, 2 rows → 2 batches → 2 real POSTs ----
    val (n1, v1) = relay.runCycle(obj, outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (2L, 11L, "U", 2.5, """{"k":2}"""))), "20240115000000")
    assert(n1 == 2 && v1 == 2L)
    val phaseA = received.synchronized(received.toVector)
    assert(phaseA.size == 2, s"expected 2 POSTs, got ${phaseA.size}")
    // templated URL: {object}/{batch} substituted per batch
    assert(phaseA.map(_.path).toSet == Set("/ingest/orders/0", "/ingest/orders/1"))
    phaseA.foreach { r =>
      assert(r.headers("Authorization") == "Bearer sekrit-token", "auth header on the wire")
      assert(r.headers("Content-type") == "application/json")
      assert(r.headers("Content-encoding") == "gzip")
      assert(r.headers("X-total-batches") == "2")
    }
    assert(phaseA.map(_.headers("X-batch-number")).toSet == Set("1", "2"))
    // bodies gunzip to the envelope JSON — one Version per envelope
    val bodiesA = phaseA.map(r => gunzip(r.body))
    assert(bodiesA.forall(_.contains("\"$operation\"")))
    assert(Seq(1L, 2L).forall(v => bodiesA.exists(_.contains(s"\"Version\":$v"))),
      s"expected versions 1,2 across bodies:\n${bodiesA.mkString("\n")}")
    assert(store.deadLetters.isEmpty, "no failures on the healthy server")

    // ---- phase B: server killed → connection refused → dead letters ----
    server.stop(0)
    val (n2, v2) = relay.runCycle(obj, outboxDf(Seq(
      (1L, 10L, "I", 1.5, """{"k":1}"""),
      (2L, 11L, "U", 2.5, """{"k":2}"""),
      (3L, 12L, "U", 3.5, """{"k":3}"""),
      (4L, 13L, "D", 0.0, null))), "20240115000100")
    assert(n2 == 2 && v2 == 4L) // only the two new rows export (at-least-once watermark)
    val letters = store.deadLetters.select("error_message", "data")
      .as[(String, String)].collect()
    assert(letters.length == 2, s"both failed envelopes dead-letter: ${letters.toSeq}")
    assert(letters.forall(l => l._1.contains("ConnectException") || l._1.contains("HTTP")))
    assert(Seq(3L, 4L).forall(v => letters.exists(_._2.contains(s"\"Version\":$v"))))

    // ---- phase C: server revived on the SAME port → replay the STORED data ----
    val revived = ArrayBuffer.empty[Received]
    val server2 = startServer(port, revived)
    try {
      val (ok, bad) = relay.replayCycle(
        (_: String, data: String) => Sinks.httpPost(Sinks.HttpRequest(
          s"http://127.0.0.1:$port/replay",
          Map("Content-Type" -> "application/json"), data.getBytes("UTF-8"))).isRight,
        new java.sql.Timestamp(1705276800000L))
      assert(ok == 2 && bad == 0, s"replay must drain: ok=$ok bad=$bad")
      assert(store.deadLetters.isEmpty, "DLQ empty after successful replay")
      val replayed = revived.synchronized(revived.toVector)
      assert(replayed.size == 2)
      // the replayed wire bytes ARE the stored envelopes that failed
      val replayedBodies = replayed.map(r => new String(r.body, "UTF-8")).toSet
      assert(replayedBodies == letters.map(_._2).toSet,
        "replay must re-send exactly the stored envelope data")
    } finally server2.stop(0)
  }
}
