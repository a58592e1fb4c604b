package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 (live-JDBC flavor): the partitioned parallel JDBC read a deployment
  * points at a real change table — the "Structured Streaming + JDBC
  * source" shape (BASELINE.json / SURVEY §4).
  *
  * Two scale decisions, both encoded here rather than left to callers:
  *  - the version/horizon predicate is inlined into the `dbtable`
  *    SUBQUERY, so the DATABASE evaluates it (a bare table read with a
  *    Spark-side filter round-trips every row; JDBC pushdown of a
  *    `query`+filter combination is dialect-dependent — the subquery is
  *    the portable guarantee);
  *  - the read is RANGE-PARTITIONED on the version column between the
  *    watermark and the frontier, so `numPartitions` executors fetch
  *    disjoint slices concurrently instead of one connection streaming
  *    the whole delta.
  *
  * Dialect wire settings mirror the reference's
  * `Source/Data/SqlDialect.cs:50-58` (Packet Size 32768, `SET TEXTSIZE`
  * for unbounded CLOB reads, 30 s connect timeout — the mssql connection
  * properties come from `Config.MssqlDefaults`, the same map the config
  * validator uses). NOTE: `load()` is NOT lazy — Spark's JDBC relation
  * resolves the schema over a live connection at load() time, so assemble
  * readers only where a database is reachable. No database exists in this
  * environment; the spec asserts the pure option map. */
object JdbcChangeSource {

  final case class JdbcSourceConfig(
      url: String,
      driver: String,
      user: String,
      password: String,
      table: String,
      versionCol: String = "id",
      xactCol: String = "xact_id",
      numPartitions: Int = 8,
      fetchSize: Int = 10000,
      connectTimeoutSeconds: Int = 30)

  /** The db-side delta query: strictly-after the watermark, strictly-below
    * the transaction horizon — the same P1+P2 semantics the offline source
    * implements, evaluated where the data lives. */
  def pushdownQuery(cfg: JdbcSourceConfig, fromVersion: Long, horizon: Long): String =
    s"(SELECT * FROM ${cfg.table} WHERE ${cfg.versionCol} > $fromVersion " +
      s"AND ${cfg.xactCol} < $horizon) AS delta"

  /** Per-dialect session initialization, from the dialect registry
    * (`SqlDialect.cs:50-58`): mssql gets TEXTSIZE + ANSI_WARNINGS, postgres
    * needs none (json/text returns arrive whole). */
  def sessionInit(provider: String): Option[String] =
    graft.runtime.Config.dialect(provider).flatMap(_.sessionInit)

  /** The complete option map for `spark.read.format("jdbc")`. Pure and
    * deterministic — the testable surface. */
  def options(cfg: JdbcSourceConfig, provider: String, fromVersion: Long,
              horizon: Long, upperBound: Long): Map[String, String] = {
    require(upperBound >= fromVersion, "frontier must be at or after the watermark")
    val base = Map(
      "url" -> cfg.url,
      "driver" -> cfg.driver,
      "user" -> cfg.user,
      "password" -> cfg.password,
      "dbtable" -> pushdownQuery(cfg, fromVersion, horizon),
      "partitionColumn" -> cfg.versionCol,
      "lowerBound" -> fromVersion.toString,
      // JDBC bounds must satisfy lower < upper even for an empty delta
      "upperBound" -> math.max(upperBound, fromVersion + 1).toString,
      "numPartitions" -> cfg.numPartitions.toString,
      "fetchsize" -> cfg.fetchSize.toString,
      "queryTimeout" -> "300") // reference's command timeout (BASELINE.md)
    // Unreserved options pass through to the driver as connection
    // properties: EVERY dialect's wire defaults from the registry, with the
    // config's timeout winning over the default. The timeout KEY is
    // per-driver (ADO.NET "Connect Timeout" vs pgJDBC "connectTimeout").
    val wire = graft.runtime.Config.dialect(provider) match {
      case Some(d) =>
        val timeoutKey =
          if (d.name == "mssql") "Connect Timeout" else "connectTimeout"
        graft.runtime.Config.mergeConnectionProps(
          Map(timeoutKey -> cfg.connectTimeoutSeconds.toString),
          d.connectionDefaults)
      case None => Map.empty[String, String]
    }
    base ++ wire ++ sessionInit(provider).map("sessionInitStatement" -> _)
  }

  /** Assemble the reader. NOT lazy: `load()` resolves the schema over a
    * live connection (`SELECT ... WHERE 1=0`) before any action runs. */
  def read(spark: SparkSession, cfg: JdbcSourceConfig, provider: String,
           fromVersion: Long, horizon: Long, upperBound: Long): DataFrame =
    spark.read.format("jdbc")
      .options(options(cfg, provider, fromVersion, horizon, upperBound))
      .load()
}
