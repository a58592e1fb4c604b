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

  /** Mirrors Fixtures.urlExpr over an arbitrary id SQL expression — the
    * dedup query passes a coarse residue so URLs collide; `urls` keeps the
    * one-URL-per-doc default. */
  def urlsFrom(idSql: String): String =
    s"""url_base AS (
      |  SELECT doc_id, text,
      |         'site' || CAST($idSql % 97 AS VARCHAR) || '.' ||
      |           (['com','org','co.uk','de','com.au','io','ac.uk'])[CAST($idSql % 7 + 1 AS INTEGER)]
      |           AS host_core,
      |         CASE WHEN $idSql % 2 = 0 THEN 'https' ELSE 'http' END AS sch0
      |  FROM documents),
      |url_hosts AS (
      |  SELECT doc_id, text, sch0,
      |         CASE WHEN $idSql % 9 = 0 THEN 'www.' || host_core ELSE host_core END AS host_www
      |  FROM url_base),
      |urls AS (
      |  SELECT doc_id, text,
      |         (CASE WHEN $idSql % 11 = 0 THEN upper(sch0) ELSE sch0 END)
      |         || '://'
      |         || (CASE WHEN $idSql % 17 = 0
      |                  THEN 'u' || CAST($idSql % 5 AS VARCHAR) || '@' ELSE '' END)
      |         || (CASE WHEN $idSql % 3 = 0 THEN upper(host_www) ELSE host_www END)
      |         || (CASE WHEN $idSql % 5 = 0 THEN ':443' WHEN $idSql % 5 = 1 THEN ':80'
      |                  WHEN $idSql % 5 = 2 THEN ':8080' ELSE '' END)
      |         || (CASE WHEN $idSql % 13 = 0 THEN ''
      |                  ELSE '/p/' || CAST($idSql % 50 AS VARCHAR) END)
      |         || (CASE WHEN $idSql % 4 = 0
      |                  THEN '?utm_source=feed&id=' || CAST($idSql % 20 AS VARCHAR)
      |                  WHEN $idSql % 4 = 1
      |                  THEN '?id=' || CAST($idSql % 20 AS VARCHAR) || '&utm_campaign=x&ref=tw'
      |                  WHEN $idSql % 4 = 2 THEN '?utm_medium=email' ELSE '' END)
      |         || (CASE WHEN $idSql % 6 = 0
      |                  THEN '#sec-' || CAST($idSql % 3 AS VARCHAR) ELSE '' END) AS url
      |  FROM url_hosts)""".stripMargin

  /** Mirrors Fixtures.urlDocs. */
  val urls: String = urlsFrom("doc_id")

  /** Step-by-step replay of UrlOps.withUrlParts/normalizeUrls over the
    * `urls` CTE, ending in `url_parsed` (doc_id, url, sch, host, port,
    * path, qc, labs, n, last2, rd). Every regex is the Scala pattern
    * verbatim (all RE2-safe); the tracking strip carries the 'g' flag
    * because DuckDB's regexp_replace is first-match-only by default. */
  val urlParsed: String = {
    val trackRe = ops.UrlOps.TrackingParamRe
    val tldIn = ops.UrlOps.MultiPartTlds.map(t => s"'$t'").mkString(", ")
    s"""up0 AS (
      |  SELECT doc_id, url, regexp_replace(trim(url), '#.*$$', '') AS u1 FROM urls),
      |up1 AS (
      |  SELECT doc_id, url, u1,
      |         regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS sch_raw
      |  FROM up0),
      |up2 AS (
      |  SELECT doc_id, url, lower(sch_raw) AS sch,
      |         CASE WHEN sch_raw <> '' THEN substring(u1, length(sch_raw) + 4)
      |              ELSE u1 END AS rest
      |  FROM up1),
      |up3 AS (
      |  SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS auth FROM up2),
      |up4 AS (
      |  SELECT *, substring(rest, length(auth) + 1) AS pathq,
      |         regexp_replace(auth, '^[^@]*@', '') AS hostport
      |  FROM up3),
      |up5 AS (
      |  SELECT *, regexp_extract(hostport, ':([0-9]+)$$', 1) AS ports FROM up4),
      |up6 AS (
      |  SELECT *,
      |         lower(CASE WHEN ports <> ''
      |                    THEN substring(hostport, 1, length(hostport) - length(ports) - 1)
      |                    ELSE hostport END) AS host,
      |         regexp_extract(pathq, '^([^?]*)', 1) AS path
      |  FROM up5),
      |up7 AS (
      |  SELECT *,
      |         CASE WHEN length(pathq) > length(path)
      |              THEN substring(pathq, length(path) + 2) ELSE '' END AS qraw,
      |         CASE WHEN ports = '' THEN ''
      |              WHEN sch = 'http' AND ports = '80' THEN ''
      |              WHEN sch = 'https' AND ports = '443' THEN ''
      |              ELSE ports END AS port
      |  FROM up6),
      |up8 AS (
      |  SELECT *,
      |         substring(regexp_replace('&' || qraw, '&$trackRe=[^&]*', '', 'g'), 2) AS qc,
      |         string_split(host, '.') AS labs
      |  FROM up7),
      |up9 AS (
      |  SELECT *, len(labs) AS n,
      |         list_extract(labs, len(labs) - 1) || '.' || list_extract(labs, len(labs)) AS last2
      |  FROM up8),
      |url_parsed AS MATERIALIZED (
      |  SELECT doc_id, url, sch, host, port, path, qc, labs, n, last2,
      |         CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN host
      |              WHEN n >= 3 AND last2 IN ($tldIn)
      |              THEN list_extract(labs, n - 2) || '.' || last2
      |              WHEN n >= 2 THEN last2 ELSE host END AS rd
      |  FROM up9)""".stripMargin
  }

  /** url_parsed extended with the reassembled canonical URL (url_norm). */
  val urlNormalized: String =
    """url_norm_t AS (
      |  SELECT doc_id, url,
      |         (CASE WHEN sch = '' THEN '' ELSE sch || '://' END)
      |         || host
      |         || (CASE WHEN port = '' THEN '' ELSE ':' || port END)
      |         || (CASE WHEN path = '' THEN '/' ELSE path END)
      |         || (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS url_norm,
      |         host, rd
      |  FROM url_parsed)""".stripMargin
}
