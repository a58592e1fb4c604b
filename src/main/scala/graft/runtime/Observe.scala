package graft.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Dlq
import graft.state.ParquetStateStore

/** §3.3 — the operational read surface: health/state/stats queries over the
  * engine's control tables, each a plain DataFrame op (reference
  * Program.cs:566-983, DeadLetterMonitor.cs:101-209). */
object Observe {

  /** GET /health/state — per-environment rollup of the watermark table
    * (A7). */
  def state(store: ParquetStateStore): DataFrame =
    store.watermarks.groupBy(col("environment_name"))
      .agg(
        count(lit(1)).as("objects"),
        min(col("last_version")).as("min_version"),
        max(col("last_version")).as("max_version"),
        max(col("last_updated")).as("last_activity"))

  /** GET /ui/api/deadletters — filtered, paged DLQ view (P9 + W1). */
  def deadLetterPage(store: ParquetStateStore, term: Option[String],
                     pageSize: Int, pageIndex: Int): DataFrame = {
    val base = term.fold(store.deadLetters)(t => Dlq.search(store.deadLetters, t))
    Dlq.page(base, pageSize, pageIndex)
  }

  /** Monitor stats: window counts + top offenders + threshold status in one
    * summary row (A5/A6/F13). */
  def dlqSummary(store: ParquetStateStore, now: Column, threshold: Int = 100): DataFrame =
    Dlq.windowCounts(store.deadLetters, now)
      .withColumn("status", Dlq.thresholdStatus(col("total"), threshold))

  def worstOffenders(store: ParquetStateStore, k: Int = 5): DataFrame =
    Dlq.topOffenders(store.deadLetters, k)

  /** Overview totals across environments (A10). */
  def overview(store: ParquetStateStore): DataFrame =
    store.watermarks.agg(
      countDistinct(col("environment_name")).as("environments"),
      count(lit(1)).as("tracked_objects"))

  /** Pauses newest-first (O6). */
  def pauses(store: ParquetStateStore): DataFrame =
    store.pauses.orderBy(col("paused_at").desc, col("scope"))
}
