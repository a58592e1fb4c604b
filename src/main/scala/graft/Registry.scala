package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator query: a DataFrame program and (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver replays over the same parquet tables. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for query/oracle portability (see OracleCtes for the
  * rules). */
object QHelpers {
  /** Exact integer cents from a 2-dp double — immune to summation-order
    * float drift in either engine. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Timestamp rendered second-precision as a string — identical text in
    * Spark and DuckDB. */
  def tsSec(c: Column): Column = date_trunc("second", c).cast("string")

  val centsSql: String => String = x => s"CAST(round(($x)*100) AS BIGINT)"
  val tsSecSql: String => String = x => s"CAST(date_trunc('second', $x) AS VARCHAR)"

  def withCtes(ctes: String*)(body: String): String =
    s"WITH ${ctes.mkString(",\n")}\n$body"
}
