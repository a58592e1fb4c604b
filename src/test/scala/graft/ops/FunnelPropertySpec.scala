package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.Random

/** Randomized cross-check of the funnel fold (SURVEY-style invariant
  * testing): [[Funnel.funnelSteps]] computes step times with a greedy
  * per-user fold over time-sorted events; an INDEPENDENT driver reference
  * computes them with the chained conditional-min formulation the DuckDB
  * oracle uses (t1 = min step-1 time; t_j = min step-j time strictly after
  * t_{j-1} and within the window of t1). The two are provably equivalent —
  * this spec hunts for the edge cases where an implementation diverges
  * anyway: duplicate timestamps, step events before the funnel start,
  * users missing middle steps, window-boundary hits (ts == t1 + w is IN;
  * +w+1 is OUT), and event storms per user.
  *
  * Fixed seed, five trials — deterministic in CI, diverse in shape. */
class FunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("s1", "s2", "s3", "s4")
  private val types = steps ++ Seq("noise1", "noise2")

  private def referenceStepTimes(events: Seq[(Long, Long, String)],
                                 windowS: Long): Vector[Vector[Option[Long]]] = {
    val byUser = events.groupBy(_._1)
    byUser.values.map { evs =>
      def minAfter(step: String, after: Option[Long],
                   start: Option[Long]): Option[Long] = {
        val cands = evs.collect {
          case (_, t, y) if y == step &&
            after.forall(t > _) && start.forall(t <= _ + windowS) => t
        }
        if (cands.isEmpty) None else Some(cands.min)
      }
      val t1 = minAfter(steps.head, None, None)
      steps.tail.foldLeft(Vector(t1)) { (acc, s) =>
        acc :+ (if (acc.last.isEmpty) None
                else minAfter(s, acc.last, t1))
      }
    }.toVector
  }

  private def referenceCounts(events: Seq[(Long, Long, String)],
                              windowS: Long): Seq[Long] = {
    val stepTimes = referenceStepTimes(events, windowS)
    steps.indices.map(j => stepTimes.count(ts => ts(j).isDefined).toLong)
  }

  private def referenceLatency(events: Seq[(Long, Long, String)],
                               windowS: Long): Set[(Int, Long, Long, Long, Long)] =
    referenceStepTimes(events, windowS).flatMap { ts =>
      (1 until steps.size).flatMap { j =>
        for { tj <- ts(j); t1 <- ts.head } yield (j + 1, tj - t1)
      }
    }.groupBy { case (j, d) => (j, (d.toString.length - 1).toLong) }
      .map { case ((j, dec), xs) =>
        (j, dec, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max)
      }.toSet

  test("retention and transitions equal driver references on random event streams") {
    val rnd = new Random(777)
    (1 to 3).foreach { trial =>
      val events = (1 to 1200).map { _ =>
        (1L + rnd.nextInt(25), (rnd.nextInt(30) * 86400L + rnd.nextInt(86400)),
          types(rnd.nextInt(types.size)))
      }
      val df = events.zipWithIndex.map { case ((u, t, y), i) =>
        (i.toLong, new Timestamp(t * 1000L), u, y)
      }.toDF("event_id", "ts", "user_id", "event_type")

      // retention reference: cohort week = min week per user
      val wk = events.map { case (u, t, y) => (u, t / 604800L) }
      val cohort = wk.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val wantRet = wk.map { case (u, w) => (cohort(u), w - cohort(u), u) }
        .distinct.groupBy(p => (p._1, p._2)).view.mapValues(_.size.toLong).toMap
      val gotRet = Funnel.retentionCohorts(df, "ts", "user_id")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(gotRet === wantRet, s"trial $trial retention")

      // transitions reference: per user ordered by (t, event_id)
      val ordered = events.zipWithIndex
        .map { case ((u, t, y), i) => (u, t, i.toLong, y) }
        .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._4))
      val wantTr = ordered.values.flatMap(ys => ys.zip(ys.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gotTr = Funnel.transitionCounts(df, "ts", "user_id", "event_type", "event_id")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(gotTr === wantTr, s"trial $trial transitions")
    }
  }

  test("funnel fold equals the chained-conditional-min reference on random event streams") {
    val rnd = new Random(1234)
    (1 to 5).foreach { trial =>
      val nUsers = 30 + rnd.nextInt(40)
      val windowS = 50L + rnd.nextInt(200)
      val events = (1 to 1500).map { i =>
        val u = 1L + rnd.nextInt(nUsers)
        // coarse timestamps force duplicate-second collisions; a few users
        // get event storms via a biased second draw
        val t = (rnd.nextInt(40) * 10 + rnd.nextInt(3)).toLong
        val y = types(rnd.nextInt(types.size))
        (u, t, y)
      }
      val df = events.zipWithIndex.map { case ((u, t, y), i) =>
        (i.toLong, new Timestamp(t * 1000L), u, y)
      }.toDF("event_id", "ts", "user_id", "event_type")

      val got = Funnel.funnelSteps(df, "ts", "user_id", "event_type", steps, windowS)
        .orderBy(col("step_idx")).as[(Int, String, Long)].collect().map(_._3).toSeq
      val want = referenceCounts(events, windowS)
      assert(got === want,
        s"trial $trial (users=$nUsers window=$windowS): fold $got vs reference $want")
      // BOTH dispatch paths must hit the reference: foldCap = 0 forces the
      // chained conditional-min join path the dispatcher picks at 10M+
      // events — this is the path-equality pin for the volume dispatch.
      val chained = Funnel.funnelSteps(df, "ts", "user_id", "event_type",
          steps, windowS, foldCap = 0L)
        .orderBy(col("step_idx")).as[(Int, String, Long)].collect().map(_._3).toSeq
      assert(chained === want,
        s"trial $trial (users=$nUsers window=$windowS): chained $chained vs reference $want")

      // latency histograms hit the same reference on BOTH dispatch paths
      val wantLat = referenceLatency(events, windowS)
      def gotLat(foldCap: Long) = Funnel.funnelLatency(df, "ts", "user_id",
          "event_type", steps, windowS, foldCap = foldCap)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(gotLat(Long.MaxValue) === wantLat, s"trial $trial latency fold")
      assert(gotLat(0L) === wantLat, s"trial $trial latency chained")
    }
  }

  test("sessionize equals a driver-side greedy-fold reference on random event streams") {
    val rnd = new Random(77)
    for (trial <- 1 to 5) {
      val nUsers = 1 + rnd.nextInt(8)
      val gap = 120L + rnd.nextInt(300)
      // dense small time range: plenty of exact-gap ties and same-second
      // collisions; values exercise negative-free integer cents
      val events = (0 until (200 + rnd.nextInt(300))).map { i =>
        (i.toLong, rnd.nextInt(nUsers).toLong,
          rnd.nextInt(4000).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(10000) / 100.0)
      }
      val df = events.map { case (id, u, t, y, v) =>
        (id, new Timestamp(t * 1000L), u, y, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Funnel.sessionize(df, "ts", "user_id", "event_type",
          "value", "event_id")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      // reference: per user, sort by (t, id), split greedily on gap > g
      val want = events.groupBy(_._2).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1))
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          (acc, e) =>
            if (e._3 - acc.last.last._3 <= gap) acc.init :+ (acc.last :+ e)
            else acc :+ Vector(e)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (u, i + 1L, s.size.toLong, s.head._3, s.last._3,
            s.last._3 - s.head._3, s.map(_._4).distinct.size.toLong,
            s.map(e => math.floor(e._5 * 100).toLong).sum)
        }
      }.toSet
      val gotG = Funnel.sessionize(df, "ts", "user_id", "event_type",
          "value", "event_id", gapSecs = gap)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(gotG === want, s"trial $trial (users=$nUsers gap=$gap)")
      // default-gap run sanity: sessions partition the events
      assert(got.toSeq.map(_._3).sum === events.size.toLong)
    }
  }
}
