package graft

/** DuckDB SQL fragments that mirror [[graft.fixtures.Fixtures]] exactly.
  *
  * The driver registers each parquet table under its bare name and runs
  * `SparkEntry.oracleSql` in DuckDB; these CTEs re-derive the same synthetic
  * inputs (outbox / dead letters / probe log / export files) the Spark side
  * builds, so both engines compute over identical data.
  *
  * Portability rules used throughout the oracle SQL in this repo:
  *  - double→int conversions always go through floor() (DuckDB rounds on
  *    CAST, Spark truncates);
  *  - money sums are done in integer cents (CAST(round(x*100) AS BIGINT));
  *  - hashes are sha256 lowercase hex in both engines;
  *  - timestamps that appear in output go through date_trunc('second') then
  *    CAST to VARCHAR (tsSec/tsSecSql — SECOND precision; and ORDER BY must
  *    bind to the raw column, not the truncated alias);
  *  - arrays in output go through array_to_string;
  *  - latest-write-wins aggregates use `arg_max(struct_pack(v := x), id).v`,
  *    never bare `arg_max(x, id)`: DuckDB's arg_max SKIPS null arguments,
  *    so a NULL-carrying latest write would silently lose to an older
  *    non-null one while Spark's `max(struct(id, v))` keeps it (verified
  *    on DuckDB 1.0; bit cdc_snapshot_apply);
  *  - multiply-referenced non-trivial CTEs are `AS MATERIALIZED` (DuckDB
  *    1.0 inlines CTEs — a twice-joined sha256 derivation would run twice
  *    and unfairly inflate the DuckDB denominator).
  */
object OracleCtes {

  /** Mirrors Fixtures.outbox. Payload columns are nulled for every
    * D-operation row (operation is the catch-all for any event_type outside
    * the I/U sets) — conditioning on `event_type = 'error'` instead would
    * diverge from the Spark fixture if the driver data ever grows a sixth
    * event_type. */
  val outbox: String =
    """outbox AS (
      |  SELECT event_id AS id,
      |         event_id + (event_id % 7) * 5 AS xact_id,
      |         CASE WHEN event_type IN ('click','view') THEN 'I'
      |              WHEN event_type IN ('purchase','signup') THEN 'U'
      |              ELSE 'D' END AS operation,
      |         user_id AS session_id,
      |         CASE WHEN event_type IN ('click','view','purchase','signup') THEN ts END AS recorded_on,
      |         CASE WHEN event_type IN ('click','view','purchase','signup') THEN value END AS value,
      |         CASE WHEN event_type IN ('click','view','purchase','signup') THEN props END AS props,
      |         CASE WHEN event_type IN ('purchase','signup') THEN
      |           CASE WHEN value > 100 THEN ['value','props'] ELSE ['value'] END
      |         END AS changed
      |  FROM events)""".stripMargin

  /** Mirrors Fixtures.deadLetters. */
  val deadLetters: String =
    """dlq AS (
      |  SELECT event_id AS id,
      |         'env' || CAST(user_id % 3 AS VARCHAR) || '_obj' || CAST(user_id % 5 AS VARCHAR)
      |           || '_db' || CAST(user_id % 2 AS VARCHAR) AS source_key,
      |         'obj' || CAST(user_id % 5 AS VARCHAR) AS tracking_object_name,
      |         CASE WHEN event_id % 11 <> 0
      |              THEN 'env' || CAST(user_id % 3 AS VARCHAR) END AS environment_name,
      |         'db' || CAST(user_id % 2 AS VARCHAR) AS database_name,
      |         sha256(props) AS data_hash,
      |         props AS data,
      |         'boom ' || event_type AS error_message,
      |         ts AS "timestamp",
      |         CAST(event_id % 7 AS INTEGER) AS attempts,
      |         CASE WHEN event_id % 3 <> 0 THEN ts + INTERVAL 2 HOUR END AS next_attempt
      |  FROM events)""".stripMargin

  /** Mirrors Fixtures.probeLog. */
  val probeLog: String =
    """probe_log AS (
      |  SELECT event_id AS id,
      |         'env' || CAST(user_id % 3 AS VARCHAR) AS env,
      |         CAST(floor(date_part('epoch', ts)) AS BIGINT) AS started_at,
      |         CAST(floor(date_part('epoch', ts)) AS BIGINT)
      |           + CAST(floor(value * 10) AS BIGINT) AS ended_at
      |  FROM events)""".stripMargin

  /** Mirrors Fixtures.exportFiles. */
  val exportFiles: String =
    """export_files AS (
      |  SELECT 'env' || CAST(user_id % 3 AS VARCHAR) AS env,
      |         CAST(ts AS DATE) AS day,
      |         CAST(sum(length(props)) AS BIGINT) AS size_bytes,
      |         max(event_id) AS file_id
      |  FROM events
      |  GROUP BY 1, 2)""".stripMargin

  /** Mirrors Fixtures.pauses. */
  val pauses: String =
    """pauses AS (
      |  SELECT event_id AS id,
      |         CASE WHEN event_id % 2 = 0
      |              THEN 'env:env' || CAST(user_id % 3 AS VARCHAR)
      |              ELSE 'obj:env' || CAST(user_id % 3 AS VARCHAR)
      |                   || '/obj' || CAST(user_id % 5 AS VARCHAR) END AS scope,
      |         ts AS created
      |  FROM events WHERE event_id % 97 = 0)""".stripMargin

  /** Fixed reference instant (see Fixtures.RefNow). */
  val refNow: String = s"TIMESTAMP '${fixtures.Fixtures.RefNow}'"
}
