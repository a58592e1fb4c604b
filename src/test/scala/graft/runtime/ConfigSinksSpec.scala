package graft.runtime

import graft.SparkSpec
import graft.model.{EnvironmentConfig, SinkEndpoint, TrackingObject}
import graft.sinks.{ExportMeta, Sinks}

/** Config-validator rules (ConfigurationValidatorTests pattern) and sink
  * guard-level behavior (MessageQueueServiceTests pattern). */
class ConfigSinksSpec extends SparkSpec {

  private val goodObj = TrackingObject("orders", "db0", "t", "sp")
  private def env(
      provider: String = "postgres",
      objs: Seq[TrackingObject] = Seq(goodObj),
      eps: Seq[SinkEndpoint] = Nil,
      poll: Int = 30) =
    EnvironmentConfig("prod", provider, objs, eps, pollingIntervalSeconds = poll)

  test("K7: kafkaFrame emits the native kafka sink frame (key/value/topic)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = Seq((1L, "p1"), (2L, "p2")).toDF("id", "payload")
    val frame = Sinks.kafkaFrame(batch, "graft-changes", "id",
      to_json(struct(col("id"), col("payload"))))
    assert(frame.columns.toSeq == Seq("key", "value", "topic"))
    val rows = frame.as[(String, String, String)].collect().sortBy(_._1)
    assert(rows.head == ("1", """{"id":1,"payload":"p1"}""", "graft-changes"))
  }

  test("provider aliases normalize case-insensitively; unknown rejected") {
    assert(Config.normalizeProvider(" SqlServer ").contains("mssql"))
    assert(Config.normalizeProvider("PostgreSQL").contains("postgres"))
    assert(Config.normalizeProvider("oracle").isEmpty)
    assert(Config.validate(env(provider = "oracle")).errors.exists(_.contains("unknown provider")))
  }

  test("validation catches empty names, bad sync mode, missing conn string, dup objects") {
    val bad = env(objs = Seq(
      goodObj,
      goodObj.copy(name = "orders"),                        // duplicate
      TrackingObject("x", "nodb", "t", "", "Sometimes")))   // bad proc + mode
    val v = Config.validate(bad, connectionStrings = Map("db0" -> "cs"))
    assert(v.errors.exists(_.contains("duplicate tracking object")))
    assert(v.errors.exists(_.contains("StoredProcedureName")))
    assert(v.errors.exists(_.contains("InitialSyncMode")))
    assert(v.errors.exists(_.contains("no connection string for database key 'nodb'")))
  }

  test("polling interval outside 5-3600 warns but does not error") {
    val v = Config.validate(env(poll = 2))
    assert(v.ok && v.warnings.exists(_.contains("PollingIntervalSeconds")))
  }

  test("global-settings bands: each edge warns on the reference's rule, never errors") {
    // ConfigurationValidator.cs:88-114 band table — (description, config,
    // expected warning fragment or None). Edges chosen to pin BOTH sides of
    // every band.
    val base = env()
    val cases: Seq[(String, EnvironmentConfig, Option[String])] = Seq(
      ("RetryCount -1 invalid",      base.copy(retryCount = -1),        Some("RetryCount=-1")),
      ("RetryCount 0 ok",            base.copy(retryCount = 0),         None),
      ("RetryCount 10 ok",           base.copy(retryCount = 10),        None),
      ("RetryCount 11 excessive",    base.copy(retryCount = 11),        Some("RetryCount=11")),
      ("RetryDelay 0 too low",       base.copy(retryDelaySeconds = 0),  Some("RetryDelaySeconds=0")),
      ("RetryDelay 1 ok",            base.copy(retryDelaySeconds = 1),  None),
      ("MaxRecords 99 too chatty",   base.copy(maxRecordsPerBatch = 99),    Some("MaxRecordsPerBatch=99")),
      ("MaxRecords 100 ok",          base.copy(maxRecordsPerBatch = 100),   None),
      ("MaxRecords 10000 ok",        base.copy(maxRecordsPerBatch = 10000), None),
      ("MaxRecords 10001 too large", base.copy(maxRecordsPerBatch = 10001), Some("MaxRecordsPerBatch=10001")),
      ("MaxPayload 1MB-1 small",     base.copy(maxPayloadSizeBytes = 1024L * 1024 - 1), Some("MaxPayloadSizeBytes")),
      ("MaxPayload 1MB ok",          base.copy(maxPayloadSizeBytes = 1024L * 1024),     None))
    for ((desc, cfg, expect) <- cases) {
      val v = Config.validate(cfg)
      assert(v.ok, s"$desc: bands must warn, not error — got ${v.errors}")
      expect match {
        case Some(frag) => assert(v.warnings.exists(_.contains(frag)),
          s"$desc: expected a warning containing '$frag' in ${v.warnings}")
        case None => assert(!v.warnings.exists(w => w.contains("RetryCount") ||
          w.contains("RetryDelaySeconds") || w.contains("MaxRecords") ||
          w.contains("MaxPayload")), s"$desc: unexpected band warning in ${v.warnings}")
      }
    }
  }

  test("validateAll: deployment-level errors — empty env list, Health:Port range") {
    assert(Config.validateAll(Nil).errors.exists(_.contains("no environments")))
    assert(Config.validateAll(Seq(env()), healthPort = Some(0))
      .errors.exists(_.contains("Health:Port=0")))
    assert(Config.validateAll(Seq(env()), healthPort = Some(65536))
      .errors.exists(_.contains("Health:Port=65536")))
    assert(Config.validateAll(Seq(env()), healthPort = Some(65535)).ok)
    assert(Config.validateAll(Seq(env()), healthPort = None).ok) // health disabled
    // Per-env errors and warnings aggregate through.
    val agg = Config.validateAll(Seq(env(provider = "oracle"), env(poll = 2)))
    assert(agg.errors.exists(_.contains("unknown provider")))
    assert(agg.warnings.exists(_.contains("PollingIntervalSeconds")))
  }

  test("endpoint validation: unknown kind, missing target, malformed url") {
    val v = Config.validate(env(eps = Seq(
      SinkEndpoint("a", "http", ""),
      SinkEndpoint("b", "carrierpigeon", "x"),
      SinkEndpoint("c", "http", "ftp://nope"))))
    assert(v.errors.exists(_.contains("'a': http Url is required")))
    assert(v.errors.exists(_.contains("unknown sink kind 'carrierpigeon'")))
    assert(v.errors.exists(_.contains("'c': Url must start with")))
  }

  test("broker endpoint validation: per-broker required fields") {
    val v = Config.validate(env(eps = Seq(
      SinkEndpoint("r", "rabbitmq", "q1"),                       // missing HostName
      SinkEndpoint("s", "awssqs", "q2", headers = Map("Region" -> "eu-1")), // missing QueueUrl
      SinkEndpoint("e", "eventhubs", "hub",
        headers = Map("ConnectionString" -> "cs", "EventHubName" -> "hub")), // complete
      SinkEndpoint("k", "kafka", "topic1"))))                    // topic-only is fine
    assert(v.errors.exists(_.contains("'r': rabbitmq config missing required HostName")))
    assert(v.errors.exists(e => e.contains("'s'") && e.contains("QueueUrl") && !e.contains("Region")))
    assert(!v.errors.exists(_.contains("'e'")))
    assert(!v.errors.exists(_.contains("'k'")))
  }

  test("connection-prop merge: user keys win over dialect defaults") {
    val merged = Config.mergeConnectionProps(
      Map("Packet Size" -> "4096", "Application Name" -> "app"),
      Config.MssqlDefaults)
    assert(merged("Packet Size") == "4096")
    assert(merged("Connect Timeout") == "30")
  }

  test("seedability invariant: postgres requires seed mode, mssql does not") {
    assert(Config.requiresSeedMode("pgsql"))
    assert(!Config.requiresSeedMode("sqlserver"))
  }

  private val meta = ExportMeta("prod", "orders", "db0", "20240115000000", 0, 2)

  test("K2 guards: batch headers set; oversized post-compression body fails, never truncates") {
    val small = Sinks.prepareHttp("""{"a":1}""", "http://h/{object}", meta)
    assert(small.isRight)
    val req = small.toOption.get
    assert(req.url == "http://h/orders")
    assert(req.headers("X-Batch-Number") == "1" && req.headers("X-Total-Batches") == "2")
    val big = Sinks.prepareHttp("x" * 100, "http://h", meta, compress = true, maxPayloadBytes = 10)
    assert(big.isLeft && big.swap.toOption.get.error.contains("exceeds cap"))
  }

  test("K3-K6 guards: required fields, per-broker caps, compression threshold") {
    assert(Sinks.prepareBrokerMessage("rabbitmq", "x", Map("queue" -> ""))
      .swap.toOption.get.error.contains("missing required fields"))
    assert(Sinks.prepareBrokerMessage("notabroker", "x", Map("q" -> "v")).isLeft)
    // Compressible payload under the ASB cap passes even though raw > cap.
    val compressible = "y" * 300000
    assert(Sinks.prepareBrokerMessage("azureservicebus", compressible, Map("queue" -> "q")).isRight)
    // Tiny payload is left uncompressed.
    val tiny = Sinks.prepareBrokerMessage("kafka", "{}", Map("topic" -> "t"))
    assert(tiny.toOption.get.sameElements("{}".getBytes("UTF-8")))
    // SQS carries a STRING body like ASB: gzip + base64, cap checked on the
    // base64-inflated wire size, and the payload round-trips.
    val sqs = Sinks.prepareBrokerMessage("awssqs", compressible, Map("QueueUrl" -> "u"))
    val roundTrip = graft.functions.Scalars.gunzipBytes(
      java.util.Base64.getDecoder.decode(sqs.toOption.get))
    assert(new String(roundTrip, "UTF-8") == compressible)
  }

  test("K8: circuit breaker opens after 3 failures and closes after the window") {
    var now = 0L
    val cb = new Sinks.CircuitBreaker(threshold = 3, openMillis = 1000, clock = () => now)
    (1 to 2).foreach(_ => cb.recordFailure("ep"))
    assert(cb.allowed("ep"))
    cb.recordFailure("ep")
    assert(!cb.allowed("ep"))
    now = 1500
    assert(cb.allowed("ep")) // window elapsed → half-open/closed again
    cb.recordSuccess("ep")
    assert(cb.allowed("ep"))
  }

  test("template rendering covers all 8 placeholders and URL-escapes") {
    val m = ExportMeta("prod env", "ord", "db", "20240101000000", 1, 3)
    val s = Sinks.renderTemplate(
      "{environment}/{object}/{database}/{key}/{timestamp}/{batch}/{totalbatches}/{guid}",
      m, "G-1", urlEscape = false)
    assert(s == "prod env/ord/db/prod env_ord/20240101000000/1/3/G-1")
    val u = Sinks.renderTemplate("http://h/{environment}", m, "G", urlEscape = true)
    assert(u == "http://h/prod+env")
  }

  test("pretty printer produces stable indented JSON") {
    val p = Sinks.prettyJson("""{"a":[1,2],"b":{"c":"x,y"}}""")
    assert(p.contains("\"a\": [") && p.contains("\"c\": \"x,y\"")) // comma inside string untouched
    assert(p.linesIterator.size > 5)
  }

  test("K1 Hadoop-FS variant writes the identical payload through a file:// scheme") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hfs")
    val m = graft.sinks.ExportMeta("prod", "orders", "db0", "20240101000000", 0, 1)
    val tpl = s"file://$dir/{object}-{batch}.json"
    val got = Sinks.writeFileHadoop("""{"k":1}""", tpl, m)
    assert(got.isRight, s"hadoop write failed: $got")
    val written = java.nio.file.Files.readString(dir.resolve("orders-0.json"))
    assert(written == Sinks.prettyJson("""{"k":1}"""),
      "payload must match the local variant byte for byte")
    // an unresolvable scheme fails into the Either, never throws (DLQ path)
    assert(Sinks.writeFileHadoop("""{"k":1}""", "nosuchscheme://x/{object}", m).isLeft)
  }
}
