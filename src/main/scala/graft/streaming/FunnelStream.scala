package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming flavor of [[graft.ops.Funnel.funnelSteps]]: per-user funnel
  * state carried across micro-batches via `flatMapGroupsWithState`, so a
  * live pipeline reports conversion as it happens instead of re-folding
  * history per cycle.
  *
  * Semantics: prefix-greedy over ARRIVAL order, event-time sorted within
  * each batch — identical to the batch fold whenever each user's events
  * arrive in event-time order across batches (the common case under a
  * per-user ordered source such as a keyed log). A step, once filled,
  * never retro-fills from late data; the one-line divergence this buys is
  * documented here rather than hidden behind an unbounded
  * reprocess-history state. State per user is k step epochs — O(users
  * in-flight): a converted funnel drops its state immediately, a user
  * with no first-step event stores nothing, and an EVENT-TIME timeout
  * (watermark-driven — a processing-time timeout would busy-spin empty
  * micro-batches just to poll the clock) evicts stalled funnels once the
  * watermark passes their conversion window. The store never grows with
  * event volume.
  *
  * Emits one [[FunnelUpdate]] per user per batch in which the user's
  * furthest step ADVANCED (quiet users emit nothing).
  */
object FunnelStream {

  final case class FunnelEvent(userId: Long, ts: Timestamp, eventType: String)
  /** stepTimes(j) = epoch-seconds of step j+1, -1 while unreached. */
  final case class FunnelState(stepTimes: Array[Long])
  final case class FunnelUpdate(userId: Long, stepReached: Int, t1: Long,
      tLast: Long)

  final case class Transition(userId: Long, fromType: String, toType: String)
  /** Per-user transition state: last event type + its epoch seconds. */
  final case class LastEvent(y: String, es: Long)

  /** Streaming counterpart of [[graft.ops.Funnel.transitionCounts]]: state
    * is ONE (last event type, last epoch) pair per user — evicted by
    * event-time timeout after `idleEvictSeconds` of user silence — and
    * each arriving event emits its (from → to) transition row; the caller
    * aggregates counts downstream (a windowed groupBy or the sink).
    * Same prefix-greedy caveat as [[advance]]: in-order per user across
    * batches ⇒ identical to the batch lead-window form. */
  def transitions(events: Dataset[FunnelEvent],
                  watermarkDelay: String = "10 minutes",
                  idleEvictSeconds: Long = 86400L): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var last = state.getOption
            val out = Vector.newBuilder[Transition]
            it.toVector.sortBy(e => (e.ts.getTime, e.eventType)).foreach { e =>
              val es = e.ts.getTime / 1000
              last.foreach(l => out += Transition(user, l.y, e.eventType))
              last = Some(LastEvent(e.eventType, es))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 60000L,
                (l.es + idleEvictSeconds) * 1000L))
            }
            out.result().iterator
          }
      }
  }

  final case class SessionEvent(userId: Long, ts: Timestamp,
      eventType: String, value: Double)

  /** Streaming counterpart of [[graft.ops.Funnel.sessionize]], built on
    * Spark's NATIVE `session_window` aggregation: the state store merges
    * overlapping per-user windows across micro-batches and Append mode
    * emits each session exactly once, when the watermark passes its end —
    * no custom state code, RocksDB-backed at scale.
    *
    * Exact batch parity: event times are truncated to SECONDS first (the
    * projected column carries the watermark, as the windowed aggregation
    * requires), and the native gap is `gapSeconds` verbatim: Spark merges
    * sessions whose windows TOUCH (next.start ≤ prev.end, verified by the
    * boundary cases in the spec — an exact-gap event stays in-session, a
    * gap+1 event opens a new one), so the native predicate is already the
    * batch rule's `t₂ − t₁ ≤ gapSeconds` on truncated seconds and the
    * emitted sessions match the batch rollup row for row (spec-pinned).
    * `n_types` uses `collect_set` size (streaming aggregation cannot
    * count distinct) — bounded by the type alphabet per session. */
  def sessions(events: Dataset[SessionEvent], gapSeconds: Long = 1800L,
               watermarkDelay: String = "10 minutes"):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events.toDF()
      .select(col("userId").as("user_id"),
        date_trunc("second", col("ts")).as("ts_s"),
        col("eventType").as("event_type"),
        floor(col("value") * 100).cast("long").as("v_cents"))
      .withWatermark("ts_s", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts_s"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_s").cast("long")).as("start_s"),
        max(col("ts_s").cast("long")).as("end_s"),
        size(collect_set(col("event_type"))).cast("long").as("n_types"),
        sum(col("v_cents")).as("rev_cents"))
      .select(col("user_id"), col("n_events"), col("start_s"), col("end_s"),
        (col("end_s") - col("start_s")).as("duration_s"),
        col("n_types"), col("rev_cents"))
  }

  /** One attribution row per conversion (emitted as it happens). */
  final case class Attribution(userId: Long, firstTouch: String,
      lastTouch: String)
  /** Per-user live-session state: entry type, last type, last epoch-s. */
  final case class SessState(entry: String, last: String, lastEs: Long)

  /** Streaming counterpart of [[graft.ops.Funnel.attribution]]: every
    * `convType` event emits its (session entry, preceding touch) credit
    * the moment it arrives, `(direct)` when it opens its session. State
    * per user is THREE fields (entry/last/lastEs) and is evicted by
    * event-time timeout once the watermark passes the session gap — a
    * closed session can never influence a future credit (the next event
    * necessarily opens a new session), so eviction is lossless and the
    * store holds only LIVE sessions regardless of history length.
    * Same prefix-greedy caveat as [[advance]]: in-order per user across
    * batches ⇒ identical to the batch window form (spec-pinned). One
    * further tie caveat: within a batch, equal-MILLISECOND events sort by
    * eventType (FunnelEvent carries no id), while the batch form breaks
    * truncated-second ties by event id — a user with two different-type
    * events in the same millisecond (or id-order ≠ type-order within one
    * second) can credit a different preceding touch than the batch replay.
    * Real keyed logs are sub-second distinct per user; carry an id column
    * into the event type if that guarantee doesn't hold. */
  def attribution(events: Dataset[FunnelEvent], convType: String,
                  gapSecs: Long = 1800L,
                  watermarkDelay: String = "10 minutes"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[SessState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption
            val out = Vector.newBuilder[Attribution]
            it.toVector.sortBy(e => (e.ts.getTime, e.eventType)).foreach { e =>
              val es = e.ts.getTime / 1000
              val opens = s.forall(es - _.lastEs > gapSecs)
              val (entry, lastTouch) =
                if (opens) (e.eventType, "(direct)")
                else (s.get.entry, s.get.last)
              if (e.eventType == convType)
                out += Attribution(user, entry, lastTouch)
              s = Some(SessState(entry, e.eventType, es))
            }
            s.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 60000L,
                (st.lastEs + gapSecs) * 1000L + 60000L))
            }
            out.result().iterator
          }
      }
  }

  def advance(events: Dataset[FunnelEvent], steps: Seq[String],
              windowSeconds: Long,
              watermarkDelay: String = "10 minutes"): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size)
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    // Deliberately NO pre-filter to step events: the watermark node
    // computes its max-event-time from the rows that REACH it, so a
    // steps-only filter (whether written before withWatermark, or after
    // it — PushPredicateThroughNonJoin pushes an eventType predicate
    // below the watermark either way) makes the watermark advance only on
    // step events. On the very stream the filter targets (mostly other
    // types), a step-quiet period then FREEZES the watermark: EventTime
    // timeouts stop firing (in-flight funnel state is never evicted) and
    // late step events the old watermark would discard get accepted.
    // The non-step shuffle cost this keeps is per-event but touches no
    // state: stepIdx.get ignores the rows and step-0 users store nothing.
    // Pre-filter UPSTREAM only if something else drives that watermark.
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val t = state.getOption.map(_.stepTimes.clone())
              .getOrElse(Array.fill(k)(-1L))
            def reached = t.lastIndexWhere(_ >= 0L) + 1
            val before = reached
            it.toVector.sortBy(e => (e.ts.getTime, e.eventType)).foreach { e =>
              stepIdx.get(e.eventType).foreach { j =>
                val es = e.ts.getTime / 1000
                val fillable =
                  if (j == 0) t(0) < 0L
                  else t(j) < 0L && t(j - 1) >= 0L && es > t(j - 1) &&
                    es <= t(0) + windowSeconds
                if (fillable) t(j) = es
              }
            }
            val after = reached
            if (after == k || after == 0) state.remove() // nothing to keep
            else {
              state.update(FunnelState(t))
              // evict once the watermark passes the conversion window
              // (clamped above the current watermark — setTimeoutTimestamp
              // rejects timestamps at/behind it)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 60000L,
                (t(0) + windowSeconds) * 1000L + 60000L))
            }
            if (after > before)
              Iterator.single(FunnelUpdate(user, after, t(0), t(after - 1)))
            else Iterator.empty
          }
      }
  }
}
