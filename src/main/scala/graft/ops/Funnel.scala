package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` table: conversion funnels,
  * cohort retention, and event-type transition counts — the product-/
  * behavior-analytics tier a training-data pipeline's telemetry side needs
  * (which documents got sampled, which users converted, how sessions flow).
  *
  * Scale shapes, deliberately:
  *  - [[funnelSteps]] is ONE shuffle on the user key: per-user events are
  *    collected sorted and folded greedily in a single `aggregate` HOF
  *    pass (k conditions per event). The alternative — k chained
  *    step-joins with a checkpointed user-cardinality intermediate per
  *    step — was MEASURED both orders at 1M and 10M events (ScaleSmoke):
  *    the fold wins 2-2.5× at 1M, the join chain wins 1.2-1.6× at 10M
  *    (the per-user collect+sort buffer outgrows the join chain's k
  *    bounded checkpoints). Both shapes are sublinear; the fold ships as
  *    the registered form because it is the single-shuffle,
  *    oracle-cross-checked one and the crossover sits well above the
  *    bench scale — revisit if production funnels run at 10M+ events per
  *    cycle (see BENCHNOTES round-9).
  *  - [[retentionCohorts]] is two keyed aggregations (first-seen week per
  *    user, then distinct users per (cohort, offset)); both shuffles hash
  *    on keys whose cardinality collapses, and the output is a bounded
  *    cohort triangle.
  *  - [[transitionCounts]] is a keyed window (lead per user) + one
  *    aggregation to a ≤ |types|² table — the window partitions by user,
  *    never globally.
  *
  * All time math is integer epoch-seconds (truncated), mirroring the
  * oracle's `floor(date_part('epoch', ts))` exactly.
  */
object Funnel {

  private def epochS(tsCol: String): Column = col(tsCol).cast("long")

  /** Greedy sequential funnel: for each user, t1 = earliest `steps(0)`
    * event; t_{j+1} = earliest `steps(j)` event strictly after t_j and
    * within `windowSeconds` of t1. Returns one row per step:
    * (step_idx, step, users) with users = count reaching that step.
    *
    * The greedy fold over time-sorted events is equivalent to the chained
    * conditional-min formulation (the first qualifying event in ascending
    * time order IS the min) — the DuckDB oracle uses the chained form, so
    * the two engines cross-check each other's strategy.
    */
  def funnelSteps(events: DataFrame, tsCol: String, userCol: String,
                  typeCol: String, steps: Seq[String],
                  windowSeconds: Long,
                  maxEventsPerUser: Option[Int] = None): DataFrame =
    foldedStepTimes(events, tsCol, userCol, typeCol, steps, windowSeconds,
      maxEventsPerUser)
      .select(explode(stepHitRows(steps)).as("s"))
      .groupBy(col("s.step_idx").as("step_idx"), col("s.step").as("step"))
      .agg(sum(col("s.hit")).as("users"))

  /** A/B-experiment funnel: deterministic content-addressed variant
    * assignment (`Sampling.bucketOf` on the user key — stable across
    * runs, engines and data growth, like every split in [[Sampling]])
    * followed by the same greedy fold, reported per (variant, step). The
    * variant is a pure function of the user key, so it rides the fold's
    * one user-keyed shuffle for free — no extra join, no second pass. */
  def abFunnel(events: DataFrame, tsCol: String, userCol: String,
               typeCol: String, steps: Seq[String], windowSeconds: Long,
               treatPermille: Int = 500, salt: String = "ab",
               maxEventsPerUser: Option[Int] = None): DataFrame = {
    val variant = when(
      Sampling.bucketOf(col(userCol), salt) < treatPermille, "treatment")
      .otherwise("control")
    foldedStepTimes(events, tsCol, userCol, typeCol, steps, windowSeconds,
      maxEventsPerUser)
      .select(variant.as("variant"), explode(stepHitRows(steps)).as("s"))
      .groupBy(col("variant"), col("s.step_idx").as("step_idx"),
        col("s.step").as("step"))
      .agg(sum(col("s.hit")).as("users"))
  }

  /** Per-step (step_idx, step, hit) rows read off the fold's `f` struct. */
  private def stepHitRows(steps: Seq[String]): Column =
    array(steps.indices.map { i =>
      struct(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
        when(col(s"f.t${i + 1}").isNotNull, 1L).otherwise(0L).as("hit"))
    }: _*)

  /** The shared greedy fold: one row per user with the k nullable step
    * epochs as struct `f` (see [[funnelSteps]] for the semantics). */
  private def foldedStepTimes(events: DataFrame, tsCol: String,
                              userCol: String, typeCol: String,
                              steps: Seq[String], windowSeconds: Long,
                              maxEventsPerUser: Option[Int]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    val k = steps.size
    // Abusive-key guard (the LSH maxBucket analog): a bot with 10^8
    // funnel-type events would otherwise materialize them all in one
    // user's aggregation buffer. When capped, only each user's EARLIEST
    // `cap` funnel-relevant events (by ts, then tie-break on the type —
    // same ordering the fold consumes) are folded; since the greedy fold
    // is prefix-driven, any user whose true funnel completes within the
    // cap is unaffected. One extra user-keyed window pass, reusing the
    // groupBy's partitioning.
    val relevant = events.filter(col(typeCol).isin(steps: _*))
    val bounded = maxEventsPerUser match {
      case None => relevant
      case Some(cap) =>
        val w = Window.partitionBy(col(userCol))
          .orderBy(epochS(tsCol), col(typeCol))
        relevant.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= cap).drop("_rn")
    }
    // One corpus pass: only funnel-relevant events survive the pushed
    // filter; ONE shuffle on the user key builds the sorted per-user list.
    val perUser = bounded
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(
        struct(epochS(tsCol).as("t"), col(typeCol).as("y")))).as("evs"))

    // Greedy fold: acc = k nullable step timestamps; an event fills the
    // FIRST unfilled step it matches, subject to strict ordering and the
    // window from t1. lit(null) needs a concrete type for the struct.
    val init = struct((1 to k).map(j =>
      lit(null).cast("long").as(s"t$j")): _*)
    val folded = perUser.select(col(userCol),
      aggregate(col("evs"), init, (acc, e) => {
        val t = e.getField("t"); val y = e.getField("y")
        // steps are distinct types, so each event can match at most one
        // slot; slots fill strictly in order (t_{j-1} filled first).
        val slots = (1 to k).map { j =>
          val cur = acc.getField(s"t$j")
          val fillable =
            if (j == 1) cur.isNull && y === steps.head
            else cur.isNull && acc.getField(s"t${j - 1}").isNotNull &&
              y === steps(j - 1) && t > acc.getField(s"t${j - 1}") &&
              t <= acc.getField("t1") + windowSeconds
          when(fillable, t).otherwise(cur).as(s"t$j")
        }
        struct(slots: _*)
      }).as("f"))
    folded
  }

  /** Weekly cohort retention triangle: cohort = integer epoch-week of the
    * user's first event, offset = event week − cohort week; one row per
    * (cohort_week, week_offset) with the distinct-user count. Integer
    * `div` week math so both engines bucket identically. */
  def retentionCohorts(events: DataFrame, tsCol: String,
                       userCol: String): DataFrame = {
    val wk = expr(s"CAST($tsCol AS LONG) div 604800").as("wk")
    val ev = events.select(col(userCol), wk)
    val first = ev.groupBy(col(userCol)).agg(min(col("wk")).as("cohort_week"))
    ev.join(first, Seq(userCol)) // same key as the groupBy — co-partitioned
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** Robust daily anomaly flags per event type: a day is anomalous when
    * its revenue deviates from the type's median by more than 3× the
    * median absolute deviation (MAD) — the outlier rule that survives the
    * heavy-tailed daily totals a z-score would be wrecked by.
    *
    * Exact integer arithmetic throughout (the repo's oracle-portability
    * doctrine): daily revenue in cents; medians doubled before the cast —
    * the median of N integers is either an integer or an integer + ½, so
    * 2·median is ALWAYS integral and the flag compare
    * `4·|dev| > 3·(4·MAD)` never touches a float.
    *
    * Scale shape: the corpus collapses in the FIRST aggregation (one row
    * per (type, day) — bounded by calendar × type cardinality); the
    * median/MAD layer runs on that bounded rollup and broadcasts back. */
  def dailyAnomalies(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"CAST($tsCol AS LONG) div 86400").as("day_idx"))
      .agg(sum(floor(col(valueCol) * 100).cast("long")).as("rev_cents"))
      .localCheckpoint() // feeds the median layer AND the flag join
    val med = daily.groupBy(col("event_type"))
      .agg((median(col("rev_cents")) * 2).cast("long").as("med2"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs(col("rev_cents") * 2 - col("med2")))
      .localCheckpoint() // feeds the MAD aggregate AND the output
    val mad = dev.groupBy(col("event_type"))
      .agg((median(col("dev2")) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("day_idx"), col("rev_cents"),
        (col("dev2") * 2 > col("mad4") * 3).as("is_anomaly"))
  }

  /** Daily revenue with a 7-day rolling sum per event type. The corpus
    * collapses in the first aggregation; the RANGE-framed window (value
    * range over `day_idx`, not ROWS — gap days must not stretch the
    * frame) runs on the calendar-bounded rollup, partitioned by type. */
  def rollingRevenue(events: DataFrame, tsCol: String, typeCol: String,
                     valueCol: String, days: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"CAST($tsCol AS LONG) div 86400").as("day_idx"))
      .agg(sum(floor(col(valueCol) * 100).cast("long")).as("rev_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
      .rangeBetween(-(days - 1).toLong, 0L)
    daily.withColumn("rev_roll_cents", sum(col("rev_cents")).over(w))
  }

  /** Week-over-week revenue growth per event type in integer basis
    * points: `(cur − prev)·10000 div prev` over the weekly rollup (lag
    * window on a bounded table). Weeks with no predecessor are absent. */
  def weekOverWeek(events: DataFrame, tsCol: String, typeCol: String,
                   valueCol: String): DataFrame = {
    val weekly = events
      .groupBy(col(typeCol).as("event_type"),
        expr(s"CAST($tsCol AS LONG) div 604800").as("week_idx"))
      .agg(sum(floor(col(valueCol) * 100).cast("long")).as("rev_cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week_idx"))
    weekly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .filter(col("prev_cents").isNotNull && col("prev_cents") =!= 0L)
      .withColumn("growth_bp",
        expr("(rev_cents - prev_cents) * 10000 div prev_cents"))
  }

  /** Weekly event counts pivoted to one column per type — the reshape
    * step a dashboard or feature table wants. `types` must be explicit:
    * an inferred pivot would scan the data twice for the distinct list
    * and make the output schema data-dependent. */
  def weeklyTypePivot(events: DataFrame, tsCol: String, typeCol: String,
                      types: Seq[String]): DataFrame =
    events
      .groupBy(expr(s"CAST($tsCol AS LONG) div 604800").as("week_idx"))
      .pivot(typeCol, types)
      .agg(count(lit(1)))
      .select(col("week_idx") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)

  /** Event-type transition counts (first-order Markov): per user, events
    * ordered by (ts, tieBreak); count (event_type → next event_type)
    * pairs. The window is keyed by user — no global sort at any scale. */
  def transitionCounts(events: DataFrame, tsCol: String, userCol: String,
                       typeCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreakCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transitions"))
  }
}
