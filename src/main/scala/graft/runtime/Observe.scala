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

  /** The DLQ monitor's stateful loop (DeadLetterMonitor.cs:44-140): each
    * tick checks the queue against the threshold and fires `alert` — but at
    * most once per cooldown window — and re-runs the retention purge on its
    * own (longer) cadence, because "the start-up purge never comes round
    * again on a long-running service" (the reference's own comment).
    * `clock` injectable for tests; state is single-threaded per monitor,
    * like the reference's single ExecuteAsync loop. Alert payload = the
    * [[dlqSummary]] row plus the top offenders, mirroring the reference's
    * log shape. */
  final class DlqMonitor(
      store: ParquetStateStore,
      threshold: Int = 100,
      alert: String => Unit = s => System.err.println(s"[dlq-monitor] $s"),
      clock: () => Long = () => System.currentTimeMillis(),
      alertCooldownMillis: Long = 60L * 60 * 1000,
      purgeIntervalMillis: Long = 24L * 60 * 60 * 1000) {

    // Option, not a MinValue sentinel: `now - Long.MinValue` overflows
    // negative and would suppress the very first alert forever.
    private var lastAlert: Option[Long] = None
    private var lastPurge = clock()

    /** One monitor tick. Returns (alerted, purged count). */
    def tick(): (Boolean, Long) = {
      val nowMs = clock()
      val total = store.deadLetters.count()
      val alerted =
        if (total >= threshold && lastAlert.forall(nowMs - _ > alertCooldownMillis)) {
          val offenders = worstOffenders(store).collect()
            .map(r => s"${r.get(0)}: ${r.get(1)} failures").mkString("; ")
          alert(s"dead letter queue threshold exceeded: total=$total " +
            s"(threshold=$threshold) top=[$offenders]")
          lastAlert = Some(nowMs)
          true
        } else false
      val purged =
        if (nowMs - lastPurge >= purgeIntervalMillis) {
          lastPurge = nowMs
          store.purgeExpiredDeadLetters(new java.sql.Timestamp(nowMs))
        } else 0L
      (alerted, purged)
    }
  }
}
