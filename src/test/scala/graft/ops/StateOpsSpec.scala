package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StateOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("J6: upsert — update wins, untouched state survives, new keys insert") {
    val state = Seq(
      ("e1", "o1", 10L, ts("2024-01-01 00:00:00")),
      ("e1", "o2", 20L, ts("2024-01-01 00:00:00"))
    ).toDF("environment_name", "object_name", "last_version", "last_updated")
    val updates = Seq(
      ("e1", "o1", 15L, ts("2024-01-02 00:00:00")), // conflict → update
      ("e2", "o9", 5L, ts("2024-01-02 00:00:00"))   // new → insert
    ).toDF("environment_name", "object_name", "last_version", "last_updated")
    val got = StateOps.watermarkUpsert(state, updates)
      .orderBy("environment_name", "object_name")
      .select($"environment_name", $"object_name", $"last_version")
      .as[(String, String, Long)].collect()
    assert(got.toSeq == Seq(("e1", "o1", 15L), ("e1", "o2", 20L), ("e2", "o9", 5L)))
  }

  test("P7: pause filter drops env-scope and obj-scope matches, case-insensitively") {
    val objects = Seq(
      ("Prod", "Orders"), ("Prod", "Users"), ("Dev", "Orders")
    ).toDF("environment_name", "object_name")
    val pauses = Seq("env:dev", "obj:prod/users").toDF("scope")
    val got = StateOps.pauseFilter(objects, pauses)
      .as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("Prod", "Orders")))
  }

  test("P10: routing resolves case-insensitively; unmatched marked unroutable") {
    val rows = Seq(
      (1L, " PROD ", "orders"), (2L, "ghost", "orders")
    ).toDF("id", "environment_name", "tracking_object_name")
    val config = Seq(("prod", "Orders", "ep1")).toDF("environment_name", "object_name", "endpoint_key")
    val got = StateOps.route(rows, config).orderBy("id")
      .select($"routed", $"endpoint_key").as[(Boolean, Option[String])].collect()
    assert(got.toSeq == Seq((true, Some("ep1")), (false, None)))
  }

  test("J5: banded interval join finds exactly the naive overlap pairs") {
    // Intervals spanning bucket boundaries on purpose (bucket = 10 s).
    val probe = Seq(
      (1L, "e", 0L, 25L), (2L, "e", 24L, 30L), (3L, "e", 30L, 40L),
      (4L, "e", 95L, 130L), (5L, "e", 128L, 140L), (6L, "f", 0L, 100L),
      (7L, "f", 5L, 95L) // shares ~9 buckets with id 6 → must emit ONCE
    ).toDF("id", "env", "started_at", "ended_at")
    val got = StateOps.intervalOverlaps(probe, bucketSeconds = 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted
    // naive: (1,2) overlap; (2,3) touch at 30 → NOT overlap (strict <);
    // (4,5) overlap; (6,7) overlap across many buckets, exactly one row.
    assert(got.toSeq == Seq((1L, 2L), (4L, 5L), (6L, 7L)))
  }

  test("SET1: config diff classifies added/removed/updated") {
    val oldC = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val newC = Seq(("b", 2), ("c", 9), ("d", 4)).toDF("k", "v")
    val got = StateOps.configDiff(oldC, newC, "k", "v")
      .select($"key", $"change").as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("a", "removed"), ("c", "updated"), ("d", "added")))
  }

  test("W4: latest per key") {
    val log = Seq((1L, 1L, "x"), (1L, 3L, "z"), (1L, 2L, "y"), (2L, 1L, "q"))
      .toDF("k", "ver", "v")
    val got = StateOps.latestPerKey(log, Seq("k"), "ver")
      .select($"k", $"v").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "z"), (2L, "q")))
  }
}
