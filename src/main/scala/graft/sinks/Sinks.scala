package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.Scalars
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Sink layer: file export, HTTP/broker guards, Kafka shaping, circuit
  * breaker, export failures.
  *
  * Zero-egress environment: network sinks implement the reference's full
  * guard/validation/batching surface (the part its own tests cover —
  * MessageQueueServiceTests.cs:12-40) with the transport injected; the
  * default transport refuses, so every failure path (→ dead letter) is
  * exercisable offline.
  */
final case class ExportMeta(
    environment: String,
    objectName: String,
    database: String,
    timestampUtc: String,
    batch: Int = 0,
    totalBatches: Int = 1)

final case class ExportFailure(endpointKey: String, error: String)

object Sinks {

  /** Substitute the reference's 8 path/URL placeholders.
    * Ref: ExportService.cs:157-165,264-291. */
  def renderTemplate(template: String, m: ExportMeta, guid: String, urlEscape: Boolean): String = {
    val bind = Map(
      "timestamp" -> m.timestampUtc, "object" -> m.objectName,
      "database" -> m.database, "environment" -> m.environment,
      "key" -> s"${m.environment}_${m.objectName}", "guid" -> guid,
      "batch" -> m.batch.toString, "totalbatches" -> m.totalBatches.toString)
    bind.foldLeft(template) { case (acc, (k, v)) =>
      val value = if (urlEscape) java.net.URLEncoder.encode(v, "UTF-8") else v
      acc.replace(s"{$k}", value)
    }
  }

  /** K1 — file sink: one pretty-printed JSON file per batch at the
    * templated path; directories auto-created. The payload is one batch,
    * capped upstream by MaxRecordsPerBatch/MaxPayloadSizeBytes, so each
    * write is bounded by construction (the same reason the reference can
    * hold the batch in memory — ExportService.cs:156-197).
    *
    * NOTE: this variant writes through `java.nio` — LOCAL filesystem of
    * whichever process runs it. The relay invokes sinks on EXECUTORS, so
    * cluster deployments must point the template at storage every executor
    * shares, or use [[writeFileHadoop]], which resolves the template
    * through the Hadoop FileSystem API (`hdfs://`, `s3a://`, `file://`). */
  def writeFile(envelopeJson: String, pathTemplate: String, m: ExportMeta): Either[ExportFailure, String] =
    try {
      val path = renderTemplate(pathTemplate, m, java.util.UUID.randomUUID().toString, urlEscape = false)
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.write(p, prettyJson(envelopeJson).getBytes(StandardCharsets.UTF_8))
      Right(path)
    } catch {
      case e: Exception => Left(ExportFailure("file", e.getMessage))
    }

  /** [[writeFile]] through the Hadoop FileSystem API — the cluster-correct
    * K1: the templated path's SCHEME selects the storage (`hdfs://`,
    * `s3a://`, `file://`...), so executor-side writes land on shared
    * storage instead of executor-local disk. Overwrite semantics match the
    * local variant (the template's {guid}/{timestamp} placeholders make
    * collisions a configuration choice, as in the reference). */
  def writeFileHadoop(envelopeJson: String, pathTemplate: String, m: ExportMeta,
                      hadoopConf: org.apache.hadoop.conf.Configuration =
                        new org.apache.hadoop.conf.Configuration()): Either[ExportFailure, String] =
    try {
      val path = renderTemplate(pathTemplate, m, java.util.UUID.randomUUID().toString, urlEscape = false)
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(hadoopConf)
      val out = fs.create(hPath, true)
      try out.write(prettyJson(envelopeJson).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      Right(path)
    } catch {
      case e: Exception => Left(ExportFailure("file", e.getMessage))
    }

  /** Minimal stable pretty-printer for the envelope JSON (reference writes
    * indented JSON; ExportService.cs:173). Deterministic, no library. */
  def prettyJson(json: String): String = {
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    var esc = false
    json.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else c match {
        case '\\' if inStr => sb.append(c); esc = true
        case '"' => sb.append(c); inStr = !inStr
        case '{' | '[' if !inStr =>
          depth += 1; sb.append(c).append('\n').append("  " * depth)
        case '}' | ']' if !inStr =>
          depth -= 1; sb.append('\n').append("  " * depth).append(c)
        case ',' if !inStr => sb.append(c).append('\n').append("  " * depth)
        case ':' if !inStr => sb.append(": ")
        case _ => sb.append(c)
      }
    }
    sb.toString
  }

  /** An HTTP request fully prepared by the guard layer; `body` may be
    * gzipped. Ref: ExportService.cs:199-331. */
  final case class HttpRequest(url: String, headers: Map[String, String], body: Array[Byte])

  /** K2 — HTTP sink guards: templated URL, batch headers, optional gzip,
    * 5 MiB post-compression cap (fail → DLQ, no retry: "a retry cannot make
    * the body smaller"). Transport injected; default refuses (no egress). */
  def prepareHttp(
      envelopeJson: String,
      urlTemplate: String,
      m: ExportMeta,
      headers: Map[String, String] = Map.empty,
      compress: Boolean = false,
      maxPayloadBytes: Long = 5L * 1024 * 1024): Either[ExportFailure, HttpRequest] = {
    val url = renderTemplate(urlTemplate, m, java.util.UUID.randomUUID().toString, urlEscape = true)
    val raw = envelopeJson.getBytes(StandardCharsets.UTF_8)
    val body = if (compress) Scalars.gzipBytes(raw) else raw
    if (body.length > maxPayloadBytes)
      Left(ExportFailure("http", s"payload ${body.length} B exceeds cap $maxPayloadBytes B after compression"))
    else Right(HttpRequest(url,
      headers ++ Map(
        "Content-Type" -> "application/json",
        "X-Batch-Number" -> (m.batch + 1).toString,
        "X-Total-Batches" -> m.totalBatches.toString) ++
        (if (compress) Map("Content-Encoding" -> "gzip") else Map.empty),
      body))
  }

  /** The real HTTP transport for a [[prepareHttp]] request: one POST via
    * the JDK's HttpURLConnection (no added dependency), success = any 2xx.
    * Non-2xx and transport exceptions both map to [[ExportFailure]] so the
    * caller's failure path (→ DLQ) is uniform with the guard layer
    * (ExportService.cs:199-331 posts exactly this shape: templated URL,
    * auth/batch headers, optionally gzipped body). Callers opt IN
    * (ChangeRelay's default stays prepare-only — zero-egress posture);
    * each call is independent, so executor-side fan-out parallelizes
    * per-partition exactly like the guard path. */
  def httpPost(req: HttpRequest, timeoutMs: Int = 10000): Either[ExportFailure, Int] =
    try {
      val conn = new java.net.URL(req.url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setDoOutput(true)
        req.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val os = conn.getOutputStream
        try os.write(req.body) finally os.close()
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        if (is != null) try { is.readAllBytes(); () } finally is.close()
        if (code >= 200 && code < 300) Right(code)
        else Left(ExportFailure("http", s"HTTP $code from ${req.url}"))
      } finally conn.disconnect()
    } catch {
      case e: Exception =>
        Left(ExportFailure("http", s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }

  /** Broker caps (bytes) — reference MessageQueueService.cs:31-36. */
  val BrokerCaps: Map[String, Long] = Map(
    "rabbitmq" -> 128L * 1024 * 1024,
    "azureservicebus" -> 256L * 1024,
    "awssqs" -> 256L * 1024,
    "eventhubs" -> 1L * 1024 * 1024,
    "kafka" -> 1L * 1024 * 1024)

  val CompressionThreshold = 1024L

  /** K3–K6 guard level: required fields, compress-then-cap. Returns the
    * publishable body or the failure that dead-letters. */
  def prepareBrokerMessage(
      broker: String,
      payload: String,
      requiredFields: Map[String, String]): Either[ExportFailure, Array[Byte]] = {
    val missing = requiredFields.collect { case (k, v) if v == null || v.isEmpty => k }
    if (missing.nonEmpty)
      Left(ExportFailure(broker, s"missing required fields: ${missing.mkString(",")}"))
    else BrokerCaps.get(broker.toLowerCase) match {
      case None => Left(ExportFailure(broker, s"unknown broker type '$broker'"))
      case Some(cap) =>
        val raw = payload.getBytes(StandardCharsets.UTF_8)
        // Compression is PER-BROKER (MessageQueueService.cs:67-94,142-151):
        // ASB and SQS both carry STRING bodies, so both gzip then
        // base64-wrap — the cap must be checked against the base64-inflated
        // wire size (~4/3×), or the guard admits messages the broker
        // rejects; RabbitMQ / Event Hubs / Kafka publish raw bytes.
        val body = broker.toLowerCase match {
          case "azureservicebus" | "awssqs" if raw.length > CompressionThreshold =>
            java.util.Base64.getEncoder.encode(Scalars.gzipBytes(raw))
          case _ => raw
        }
        if (body.length > cap)
          Left(ExportFailure(broker, s"message ${body.length} B exceeds $broker cap $cap B"))
        else Right(body)
    }
  }

  /** K7 — Kafka sink shaping: the exact frame `format("kafka")` writes;
    * native at scale (df.write.format("kafka") with these columns). */
  def kafkaFrame(batch: DataFrame, topic: String, keyCol: String, valueJson: org.apache.spark.sql.Column): DataFrame =
    batch.select(
      col(keyCol).cast("string").as("key"),
      valueJson.cast("string").as("value"),
      lit(topic).as("topic"))

  /** K8 — circuit breaker per endpoint: opens after `threshold` consecutive
    * failures for `openMillis`. Driver-side state, like the reference's
    * (MessageQueueService.cs:54-130). */
  final class CircuitBreaker(threshold: Int = 3, openMillis: Long = 60000,
                             clock: () => Long = () => System.currentTimeMillis()) {
    private val failures = scala.collection.mutable.Map[String, Int]()
    private val openedAt = scala.collection.mutable.Map[String, Long]()

    def allowed(key: String): Boolean = synchronized {
      openedAt.get(key) match {
        case Some(t) if clock() - t < openMillis => false
        case Some(_) => openedAt.remove(key); failures(key) = 0; true
        case None => true
      }
    }
    def recordSuccess(key: String): Unit = synchronized {
      failures(key) = 0; openedAt.remove(key)
    }
    def recordFailure(key: String): Unit = synchronized {
      val n = failures.getOrElse(key, 0) + 1
      failures(key) = n
      if (n >= threshold) openedAt(key) = clock()
    }
    def isOpen(key: String): Boolean = !allowed(key)
  }
}
