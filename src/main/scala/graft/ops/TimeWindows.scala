package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T9 extension — event-time windowing over the events stream. The
  * reference has no analytic windows (SURVEY §2.10 T9); these are the
  * standard Spark shapes a consumer of the engine would add on top, kept
  * oracle-checkable.
  */
object TimeWindows {

  /** Tumbling counts: fixed-width buckets via `window()` — in batch AND
    * Structured Streaming (with a watermark) this is one map-side-combined
    * aggregation keyed by (bucket, key). */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     width: String): DataFrame =
    slidingCounts(events, tsCol, keyCol, width, width)

  /** Sliding counts: overlapping buckets via `window(ts, width, slide)` —
    * each event lands in `width/slide` windows (Spark expands them before
    * the aggregation, so the cost is a bounded row multiplier into the same
    * map-side-combined hash aggregate as the tumbling case; no self-join).
    * Works unchanged under Structured Streaming with a watermark. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    width: String, slide: String): DataFrame =
    events
      .groupBy(window(col(tsCol), width, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("events"))
      .select(col("w.start").as("window_start"), col(keyCol), col("events"))

  /** Session windows via gaps-and-islands: a new session starts when the
    * gap to the previous event of the same key exceeds `gapSeconds`;
    * the session id is the running count of session starts. One shuffle on
    * the key — the same partitioning every per-key op downstream reuses.
    *
    * `tieBreakCols` must make the ordering unique: two events with
    * identical (key, ts) otherwise get a nondeterministic lag order, and
    * the session assignment can vary between runs (pass a unique id).
    *
    * Boundary semantics match [[nativeSessions]]/`session_window`
    * (verified empirically): a gap of EXACTLY `gapSeconds` stays in the
    * SAME session — session_window merges an event landing on the previous
    * window's end; only a strictly larger gap splits. */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
                 gapSeconds: Long, tieBreakCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieBreakCols.map(col): _*)
    val gap = unix_timestamp(col(tsCol)) - lag(unix_timestamp(col(tsCol)), 1).over(w)
    events
      .withColumn("_new_session",
        when(gap.isNull || gap > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Native session windows: `session_window(ts, gap)` — unlike the
    * gaps-and-islands form this runs unchanged in Structured Streaming
    * (with a watermark) where Spark merges/expires session state per key.
    * A new session starts when the gap to the previous event is >= `gap`;
    * window end = last event + gap. */
  def nativeSessions(events: DataFrame, tsCol: String, keyCol: String,
                     gap: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("events"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("events"))

  /** Per-session rollup: bounds, duration, event count. */
  def sessionStats(sessions: DataFrame, tsCol: String, keyCol: String): DataFrame =
    sessions.groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("events"),
        min(unix_timestamp(col(tsCol))).as("start_epoch"),
        max(unix_timestamp(col(tsCol))).as("end_epoch"))
      .withColumn("duration_s", col("end_epoch") - col("start_epoch"))
}
