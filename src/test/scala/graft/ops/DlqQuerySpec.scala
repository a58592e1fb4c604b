package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Specs for the DLQ query family not covered elsewhere (P9 search, A5
  * window counts, W1 pagination edges, O1 replay order). */
class DlqQuerySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val now = lit(ts("2024-01-15 00:00:00"))

  private val dlq = Seq(
    (1L, "obj_a", "timeout talking to endpoint", "db0", ts("2024-01-14 23:30:00")),
    (2L, "obj_b", "connection refused", "db1", ts("2024-01-14 10:00:00")),
    (3L, "timeouts", "ok-ish", "db0", ts("2024-01-10 00:00:00")),
    (4L, "obj_c", "boom", "db_timeout", ts("2024-01-01 00:00:00"))
  ).toDF("id", "tracking_object_name", "error_message", "database_name", "timestamp")

  test("P9: search matches object OR error OR database; optional exact object filter") {
    val got = Dlq.search(dlq, "timeout").select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 4L)) // error, object, database hits
    val narrowed = Dlq.search(dlq, "timeout", objectName = Some("timeouts"))
      .select("id").as[Long].collect()
    assert(narrowed.toSeq == Seq(3L))
  }

  test("P9: LIKE metacharacters in the search term match literally") {
    val tricky = Seq(
      (1L, "o", "rate is 100%", "db"), (2L, "o", "rate is 100x", "db"),
      (3L, "a_b", "m", "db"), (4L, "aXb", "m", "db")
    ).toDF("id", "tracking_object_name", "error_message", "database_name")
    assert(Dlq.search(tricky, "100%").select("id").as[Long].collect().toSeq == Seq(1L))
    assert(Dlq.search(tricky, "a_b").select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("A5: conditional window counts in one pass") {
    val got = Dlq.windowCounts(dlq.filter($"timestamp" <= now), now)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((1L, 2L, 3L, 4L))) // 1h / 24h / 7d / total
  }

  test("W1: pagination beyond the last row is empty; first page is newest-first") {
    assert(Dlq.page(dlq, 25, 1).count() == 0)
    val first = Dlq.page(dlq, 2, 0).orderBy("rn").select("id").as[Long].collect()
    assert(first.toSeq == Seq(1L, 2L)) // newest timestamps first
  }

  test("W1 keyset: pageAfter walks the same pages as the window path, flat plan") {
    // richer snapshot with a duplicate timestamp to exercise the id
    // tie-break across a page boundary
    val snap = (dlq.as[(Long, String, String, String, Timestamp)].collect().toSeq ++ Seq(
      (5L, "obj_d", "x", "db0", ts("2024-01-14 10:00:00")), // ties with id 2
      (6L, "obj_e", "y", "db2", ts("2024-01-12 00:00:00"))
    )).toDF("id", "tracking_object_name", "error_message", "database_name", "timestamp")
    val pageSize = 2
    // walk keyset pages, feeding each page's last row in as the cursor
    var cursor: Option[(Timestamp, Long)] = None
    val keyset = Iterator.continually {
      val p = Dlq.pageAfter(snap, pageSize, cursor)
        .select("timestamp", "id").as[(Timestamp, Long)].collect()
      cursor = p.lastOption.map { case (t, i) => (t, i) }
      p.map(_._2).toSeq
    }.takeWhile(_.nonEmpty).toVector
    val windowed = (0 to 3).map(i =>
      Dlq.page(snap, pageSize, i).orderBy("rn").select("id").as[Long].collect().toSeq)
      .filter(_.nonEmpty).toVector
    assert(keyset === windowed, "keyset pages must equal the window pages")
    // structural pin: no window exec, and the sort+limit collapses to a
    // bounded TakeOrderedAndProject (never a global sort of the table)
    val plan = Dlq.pageAfter(snap, pageSize, cursor = Some((ts("2024-01-14 10:00:00"), 2L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("O1: replay batch is oldest-first and capped") {
    val due = dlq.withColumn("attempts", lit(0))
      .withColumn("environment_name", lit("e"))
      .withColumn("next_attempt", lit(null).cast("timestamp"))
    val got = Dlq.replayBatch(Dlq.dueFilter(due, 5, now), 2)
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(4L, 3L)) // two oldest
  }
}
