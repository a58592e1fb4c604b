package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic derived tables used by the correctness harness.
  *
  * The reference engine's inputs (an outbox change table, a dead-letter store,
  * a probe log) do not exist in the driver-provided test data, so each is
  * derived from `events.parquet` with pure, order-independent expressions.
  * The exact same derivation is written as a DuckDB CTE in
  * [[graft.OracleCtes]] so both engines see identical inputs.
  *
  * Outbox shape: reference Source/SQL/01-change-tracking-setup.postgres.sql:42-57
  * (id BIGINT identity = the version, xact_id for the horizon gate, operation
  * CHAR(1), key column, payload columns, changed TEXT[]).
  */
object Fixtures {

  /** Versioned append-only change table (the engine's canonical source).
    *
    *  - `id` is the monotonically increasing version (outbox identity).
    *  - `xact_id` is deliberately NOT aligned with `id` (out-of-order commit
    *    simulation: a lower id can carry a higher xact_id and vice versa),
    *    which is what the transaction-horizon gate (P2) exists for —
    *    reference Source/SQL/02-stored-procedure.postgres.table.sql:21-31.
    *  - `operation` I/U/D; delete rows carry only the key (payload NULL) —
    *    reference Source/SQL/02-stored-procedure.sqlserver.table.sql:44-50.
    *  - `changed` is the column mask, present only on U rows —
    *    reference Source/SQL/02-stored-procedure.postgres.column.sql:13-14.
    */
  def outbox(events: DataFrame): DataFrame = {
    val op = when(col("event_type").isin("click", "view"), "I")
      .when(col("event_type").isin("purchase", "signup"), "U")
      .otherwise("D")
    events.select(
      col("event_id").as("id"),
      (col("event_id") + (col("event_id") % 7) * 5).as("xact_id"),
      op.as("operation"),
      col("user_id").as("session_id"),
      when(op =!= "D", col("ts")).as("recorded_on"),
      when(op =!= "D", col("value")).as("value"),
      when(op =!= "D", col("props")).as("props"),
      when(op === "U",
        when(col("value") > 100, array(lit("value"), lit("props")))
          .otherwise(array(lit("value")))).as("changed")
    )
  }

  /** Dead-letter store — reference Source/Services/DeadLetterService.cs:36-72,
    * unique (sourceKey, dataHash); sourceKey = "{env}_{obj}_{db}". Some rows
    * have NULL environmentName (unroutable, migration-added column) and NULL
    * nextAttempt (due immediately). */
  def deadLetters(events: DataFrame): DataFrame = {
    val env = concat(lit("env"), (col("user_id") % 3).cast("string"))
    val obj = concat(lit("obj"), (col("user_id") % 5).cast("string"))
    val db  = concat(lit("db"),  (col("user_id") % 2).cast("string"))
    events.select(
      col("event_id").as("id"),
      concat(env, lit("_"), obj, lit("_"), db).as("source_key"),
      obj.as("tracking_object_name"),
      when(col("event_id") % 11 =!= 0, env).as("environment_name"),
      db.as("database_name"),
      sha2(col("props"), 256).as("data_hash"),
      col("props").as("data"),
      concat(lit("boom "), col("event_type")).as("error_message"),
      col("ts").as("timestamp"),
      (col("event_id") % 7).cast("int").as("attempts"),
      when(col("event_id") % 3 =!= 0, col("ts") + expr("INTERVAL 2 HOUR"))
        .as("next_attempt")
    )
  }

  /** Probe log for the interval-overlap oracle (J5) — reference
    * Tests/Trignis.Tests/Stress/DuplicatePollerStressTests.cs:24-31.
    * Interval endpoints are integer epoch seconds so the overlap predicate is
    * exact in both engines. */
  def probeLog(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("id"),
      concat(lit("env"), (col("user_id") % 3).cast("string")).as("env"),
      unix_timestamp(col("ts")).as("started_at"),
      (unix_timestamp(col("ts")) + floor(col("value") * 10).cast("long"))
        .as("ended_at")
    )

  /** Export-directory listing for the cumulative-cleanup operator (A8/W3) —
    * reference Source/Services/ExportService.cs:333-361. One "file" per
    * (env, day) with a deterministic size. */
  def exportFiles(events: DataFrame): DataFrame =
    events
      .groupBy(
        concat(lit("env"), (col("user_id") % 3).cast("string")).as("env"),
        to_date(col("ts")).as("day"))
      .agg(
        sum(length(col("props"))).cast("long").as("size_bytes"),
        max(col("event_id")).as("file_id"))

  /** Pause entries (env- and object-scoped) for the pause listing (O6) —
    * reference Source/Services/PauseService.cs:27-48: scope strings
    * "env:{env}" / "obj:{env}/{obj}" with a created timestamp. */
  def pauses(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 97 === 0).select(
      col("event_id").as("id"),
      when(col("event_id") % 2 === 0,
        concat(lit("env:env"), (col("user_id") % 3).cast("string")))
        .otherwise(concat(lit("obj:env"), (col("user_id") % 3).cast("string"),
          lit("/obj"), (col("user_id") % 5).cast("string"))).as("scope"),
      col("ts").as("created"))

  /** Fixed "now" for every time-relative operator so Spark and the DuckDB
    * oracle agree. Mid-range of the events table's ts span. */
  val RefNow = "2024-01-15 00:00:00"
  def refNow: Column = to_timestamp(lit(RefNow))

  /** Deterministic crawl URL per document for the URL-curation family
    * (mirrors [[graft.OracleCtes.urls]] — keep the two in lock-step).
    * Every normalization branch is exercised: mixed-case scheme/host,
    * userinfo, www prefix, default AND non-default ports (including the
    * adversarial http::443 / https::80 pairings that must be KEPT),
    * multi-part TLDs, empty paths, tracking-only query strings, fragments. */
  def urlDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), urlExpr(col("doc_id")).as("url"))

  /** URL synthesis expression over an arbitrary id column — the dedup
    * query passes a COARSE residue (doc_id % m) so distinct documents
    * collide on the canonical URL and the election branch is exercised at
    * the gate, while [[urlDocs]] keeps the one-URL-per-doc shape. Mirror:
    * [[graft.OracleCtes.urlsFrom]]. */
  def urlExpr(id: Column): Column = {
    val tld = element_at(array(Seq("com", "org", "co.uk", "de", "com.au",
        "io", "ac.uk").map(lit): _*), (id % 7 + 1).cast("int"))
    val hostCore = concat(lit("site"), (id % 97).cast("string"), lit("."), tld)
    val hostWww = when(id % 9 === 0, concat(lit("www."), hostCore)).otherwise(hostCore)
    val hostCased = when(id % 3 === 0, upper(hostWww)).otherwise(hostWww)
    val sch0 = when(id % 2 === 0, lit("https")).otherwise(lit("http"))
    val sch = when(id % 11 === 0, upper(sch0)).otherwise(sch0)
    val userinfo = when(id % 17 === 0,
      concat(lit("u"), (id % 5).cast("string"), lit("@"))).otherwise(lit(""))
    val port = when(id % 5 === 0, lit(":443")).when(id % 5 === 1, lit(":80"))
      .when(id % 5 === 2, lit(":8080")).otherwise(lit(""))
    val path = when(id % 13 === 0, lit(""))
      .otherwise(concat(lit("/p/"), (id % 50).cast("string")))
    val qs = when(id % 4 === 0,
        concat(lit("?utm_source=feed&id="), (id % 20).cast("string")))
      .when(id % 4 === 1,
        concat(lit("?id="), (id % 20).cast("string"), lit("&utm_campaign=x&ref=tw")))
      .when(id % 4 === 2, lit("?utm_medium=email"))
      .otherwise(lit(""))
    val frag = when(id % 6 === 0,
      concat(lit("#sec-"), (id % 3).cast("string"))).otherwise(lit(""))
    concat(sch, lit("://"), userinfo, hostCased, port, path, qs, frag)
  }
}
