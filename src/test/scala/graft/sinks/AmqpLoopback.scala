package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** In-JVM loopback AMQP 0-9-1 broker for wire-level specs: drives the
  * server half of the handshake, records everything a publisher sends.
  * Shared by AmqpWireSpec (single-connection byte asserts) and
  * RelayAmqpE2eSpec (relay fan-out e2e). */
object AmqpLoopback {

  /** What the broker observed for one connection. */
  final case class Seen(
    header: Array[Byte],
    mechanism: String, plainResponse: Array[Byte],
    clientFrameMax: Long,
    exchange: String, routingKey: String,
    bodySizeDeclared: Long, contentType: String, deliveryMode: Int,
    correlationId: String, headers: Map[String, String],
    bodyFrameSizes: Seq[Int], body: Array[Byte],
    closedCleanly: Boolean)

  final class Reader(payload: Array[Byte]) {
    private var p = 0
    def u8(): Int = { val v = payload(p) & 0xff; p += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16().toLong
    def u64(): Long = (u32() << 32) | u32()
    def shortStr(): String = {
      val n = u8()
      val s = new String(payload, p, n, StandardCharsets.UTF_8); p += n; s
    }
    def longBytes(): Array[Byte] = {
      val n = u32().toInt
      val b = java.util.Arrays.copyOfRange(payload, p, p + n); p += n; b
    }
    def table(): Map[String, String] = {
      val n = u32().toInt
      val end = p + n
      val m = scala.collection.mutable.LinkedHashMap[String, String]()
      while (p < end) {
        val k = shortStr()
        val t = u8()
        require(t == 'S', s"loopback broker only parses 'S' table values, got '${t.toChar}'")
        m(k) = new String(longBytes(), StandardCharsets.UTF_8)
      }
      m.toMap
    }
  }

  /** Serve exactly one publisher connection on an accepted socket. */
  def serveOne(server: ServerSocket, frameMax: Long): Seen = {
    val sock = server.accept()
    try {
      sock.setSoTimeout(10000)
      val in = new DataInputStream(sock.getInputStream)
      val out = new Amqp.Writer(new DataOutputStream(sock.getOutputStream))
      val header = new Array[Byte](8)
      in.readFully(header)
      out.frame(1, 0, new Amqp.Body().u16(10).u16(10).u8(0).u8(9)
        .table(Map("product" -> "loopback")).longStr("PLAIN").longStr("en_US").bytes)
      val startOk = new Reader(Amqp.readFrame(in).payload.drop(4))
      startOk.table()
      val mech = startOk.shortStr()
      val resp = startOk.longBytes()
      out.frame(1, 0, new Amqp.Body().u16(10).u16(30)
        .u16(0).u32(frameMax).u16(0).bytes)
      val tuneOk = new Reader(Amqp.readFrame(in).payload.drop(4))
      tuneOk.u16()
      val clientMax = tuneOk.u32()
      Amqp.readFrame(in) // Connection.Open
      out.frame(1, 0, new Amqp.Body().u16(10).u16(41).shortStr("").bytes)
      Amqp.readFrame(in) // Channel.Open
      out.frame(1, 1, new Amqp.Body().u16(20).u16(11).longStr("").bytes)
      val pub = new Reader(Amqp.readFrame(in).payload.drop(4))
      pub.u16()
      val exchange = pub.shortStr()
      val rk = pub.shortStr()
      val hf = Amqp.readFrame(in)
      require(hf.tpe == 2, "expected content header frame")
      val hr = new Reader(hf.payload)
      require(hr.u16() == 60, "content header class must be basic"); hr.u16()
      val bodySize = hr.u64()
      val flags = hr.u16()
      val contentType = if ((flags & (1 << 15)) != 0) hr.shortStr() else ""
      val hdrs = if ((flags & (1 << 13)) != 0) hr.table() else Map.empty[String, String]
      val dm = if ((flags & (1 << 12)) != 0) hr.u8() else 0
      val corr = if ((flags & (1 << 10)) != 0) hr.shortStr() else ""
      val bodyBuf = new java.io.ByteArrayOutputStream()
      val sizes = scala.collection.mutable.ArrayBuffer[Int]()
      var closed = false
      while (!closed) {
        val f = Amqp.readFrame(in)
        if (f.tpe == 3) { sizes += f.payload.length; bodyBuf.write(f.payload) }
        else if (f.tpe == 1 && f.channel == 0) {
          val r = new Reader(f.payload)
          require(r.u16() == 10 && r.u16() == 50, "expected Connection.Close")
          out.frame(1, 0, new Amqp.Body().u16(10).u16(51).bytes)
          closed = true
        } else sys.error(s"unexpected frame type ${f.tpe} on channel ${f.channel}")
      }
      Seen(header, mech, resp, clientMax, exchange, rk, bodySize, contentType,
        dm, corr, hdrs, sizes.toSeq, bodyBuf.toByteArray, closedCleanly = true)
    } finally sock.close()
  }

  /** Accept-loop broker serving until `stop()`; `seen` accumulates every
    * connection's observation (thread-safe snapshot via `snapshot`). */
  final class Server(frameMax: Long = 131072L) {
    val socket = new ServerSocket(0)
    def port: Int = socket.getLocalPort
    private val buf = scala.collection.mutable.ArrayBuffer[Seen]()
    private val t = new Thread(() => {
      try {
        while (!socket.isClosed) {
          val s = serveOne(socket, frameMax)
          buf.synchronized { buf += s }
        }
      } catch { case _: Exception => () } // socket closed → exit loop
    })
    t.setDaemon(true)
    t.start()
    def snapshot: Vector[Seen] = buf.synchronized(buf.toVector)
    def stop(): Unit = { socket.close(); t.join(5000) }
  }
}
