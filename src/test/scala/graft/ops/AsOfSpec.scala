package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before, per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")), // between s1 and s2
      (2L, "u1", ts("2024-01-01 12:00:00")), // after s2
      (3L, "u1", ts("2024-01-01 08:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 10:00:00")), // exactly at u2's state ts
      (5L, "u3", ts("2024-01-01 10:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 100L),
      ("u1", ts("2024-01-01 11:00:00"), 200L),
      ("u2", ts("2024-01-01 10:00:00"), 300L)
    ).toDF("user_id", "ts", "state_id")

    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof_state_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(100L), "between two right rows → the earlier one")
    assert(got(2L).contains(200L), "after the latest → the latest")
    assert(got(3L).isEmpty, "before any right row → null")
    assert(got(4L).contains(300L), "equal timestamps match (inclusive <=)")
    assert(got(5L).isEmpty, "key absent from right → null")
    assert(got.size == 5, "every left row survives exactly once")
  }

  test("a NULL right timestamp is never an as-of match") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", None: Option[Timestamp], 100L),             // NULL ts — never matches
      ("u1", Some(ts("2024-01-01 11:00:00")), 200L)      // after the left row
    ).toDF("user_id", "ts", "state_id")
    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof_state_id").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).isEmpty,
      "nulls-first ordering must not surface a NULL-ts right row as earliest state")
  }

  test("a NULL-key right row never matches (SQL equality, not partition grouping)") {
    val left = Seq(
      (1L, None: Option[String], ts("2024-01-01 10:00:00")), // NULL-key left row
      (2L, Some("u1"), ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (None: Option[String], ts("2024-01-01 09:00:00"), 100L), // NULL key — never matches
      (Some("u1"), ts("2024-01-01 09:00:00"), 200L)
    ).toDF("user_id", "ts", "state_id")
    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof_state_id").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).isEmpty, "NULL = NULL is not a match — left row keeps asof_* = null")
    assert(got(2L).contains(200L), "non-null keys unaffected")
    assert(got.size == 2, "NULL-key left rows still survive exactly once")
  }

  test("as-of join matches the naive max-per-row computation on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (i.toLong, s"u${rnd.nextInt(8)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to 60).map(i =>
      (s"u${rnd.nextInt(8)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30"), i.toLong))
      .toDF("user_id", "ts", "state_id")
      .groupBy("user_id", "ts").agg(org.apache.spark.sql.functions.max("state_id").as("state_id"))

    val got = AsOf.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof_state_id").as[(Long, Option[Long])].collect().toMap

    val rightRows = right.as[(String, Timestamp, Long)].collect()
    val leftRows = left.as[(Long, String, Timestamp)].collect()
    leftRows.foreach { case (id, u, t) =>
      val expected = rightRows.filter(r => r._1 == u && !r._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got(id) == expected, s"event $id (user $u at $t)")
    }
  }
}
