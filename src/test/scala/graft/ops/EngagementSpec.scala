package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stickiness and weekday-seasonality rollups vs driver-side references
  * on randomized fixtures — the same integer math re-derived independently
  * of any DataFrame machinery. */
class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("user_id", "es", "event_type")
      .withColumn("ts", col("es").cast("timestamp"))

  test("stickiness matches a driver-side reference on a randomized fixture") {
    val rnd = new scala.util.Random(7L)
    val base = 1700000000L
    val rows = (1 to 800).map { _ =>
      (rnd.nextInt(30).toLong, base + rnd.nextInt(21 * 86400).toLong, "view")
    }
    val got = Funnel.stickiness(eventsDf(rows), "ts", "user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val userDays = rows.map { case (u, es, _) => (u, es / 86400) }.distinct
    val expected = userDays.groupBy(_._2 / 7).map { case (wk, uds) =>
      val sumDau = uds.groupBy(_._2).map(_._2.size.toLong).sum
      val activeDays = uds.map(_._2).distinct.size.toLong
      val wau = uds.map(_._1).distinct.size.toLong
      (wk, sumDau, activeDays, wau, sumDau * 10000 / (7 * wau))
    }.toSet
    assert(got == expected)
  }

  test("stickiness_bp is 10000 exactly when every weekly user is active all 7 days") {
    val rows = for (u <- 1L to 3L; d <- 0L to 6L)
      yield (u, 1700006400L / 86400 * 86400 + d * 86400 + u, "view")
    val got = Funnel.stickiness(eventsDf(rows.toSeq), "ts", "user_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // the fixture spans exactly one epoch-week only if aligned; assert on
    // every emitted week instead of assuming one
    assert(got.nonEmpty)
    got.foreach { case (_, sumDau, activeDays, wau, bp) =>
      assert(sumDau == activeDays * wau, "everyone active every active day")
      assert(bp == activeDays * 10000 / 7)
    }
  }

  test("weekday seasonality matches a driver-side reference and shares ~sum to 7x10000") {
    val rnd = new scala.util.Random(11L)
    val base = 1700000000L
    val rows = (1 to 900).map { _ =>
      val t = if (rnd.nextBoolean()) "view" else "purchase"
      (rnd.nextInt(40).toLong, base + rnd.nextInt(28 * 86400).toLong, t)
    }
    val got = Funnel.weekdaySeasonality(eventsDf(rows), "ts", "event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSet

    val byType = rows.groupBy(_._3)
    val expected = byType.flatMap { case (t, evs) =>
      val total = evs.size.toLong
      evs.groupBy(e => (e._2 / 86400) % 7).map { case (wd, sub) =>
        (t, wd, sub.size.toLong, total, sub.size.toLong * 7 * 10000 / total)
      }
    }.toSet
    assert(got == expected)
    // truncating division: per-type share sum lands in (7·10000 − 7, 7·10000]
    byType.keys.foreach { t =>
      val s = got.toSeq.filter(_._1 == t).map(_._5).sum
      assert(s <= 70000L && s > 70000L - 7 * 7,
        s"type $t shares sum $s out of truncation band")
    }
  }
}
