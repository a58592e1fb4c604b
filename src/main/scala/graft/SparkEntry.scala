package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of the engine is registered here as a named query over the
  * driver-provided parquet tables, with (where ANSI-SQL-expressible) the
  * equivalent DuckDB oracle SQL. The registry itself lives in
  * [[QueriesCore]] (reference-parity operators) and [[QueriesLlm]]
  * (training-data-pipeline operators + analytic headliners).
  */
object SparkEntry {

  def allQueries: Seq[Q] = QueriesCore.all ++ QueriesLlm.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * One full incremental cycle: version filter + horizon gate + decode
    * shape + watermark — the reference's core loop. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.all.find(_.name == "p2_horizon_gate").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
