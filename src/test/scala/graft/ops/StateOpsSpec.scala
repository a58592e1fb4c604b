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

  private def cdcDf(rows: Seq[(Long, Long, String, Option[String], Option[String], Option[Seq[String]])]) =
    rows.toDF("id", "key", "operation", "a", "b", "changed")

  test("applyCdc: masked-out columns keep prior values; D removes; re-insert resets") {
    val changes = cdcDf(Seq(
      (1L, 10L, "I", Some("a1"), Some("b1"), None),
      (2L, 10L, "U", Some("a2"), None, Some(Seq("a"))), // b masked out
      (3L, 20L, "I", Some("ax"), Some("bx"), None),
      (4L, 20L, "D", None, None, None),                 // gone
      (5L, 30L, "I", Some("a5"), Some("b5"), None),
      (6L, 30L, "D", None, None, None),
      (7L, 30L, "I", Some("a7"), Some("b7"), None),     // re-insert resets
      (8L, 30L, "U", None, Some("b8"), Some(Seq("b"))),
      (9L, 40L, "U", Some("a9"), Some("b9"), None),     // maskless U = full
      (10L, 50L, "I", Some("a10"), Some("b10"), None),
      (11L, 50L, "U", None, None, Some(Seq("b")))))     // carried b = NULL
    val got = StateOps.applyCdc(changes, "key", "id", "operation", "changed",
        Seq("a", "b"))
      .as[(Long, Long, Option[String], Option[String])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (10L, 2L, Some("a2"), Some("b1")), // b survives the masked U
      (30L, 8L, Some("a7"), Some("b8")),
      (40L, 9L, Some("a9"), Some("b9")),
      // latest write WINS even when it carried NULL (the oracle's
      // struct_pack arg_max form exists for exactly this — review catch)
      (50L, 11L, Some("a10"), None)))
  }

  test("applyCdc composes: snapshot(prefix) as synthetic I rows + delta == one-shot fold") {
    val rnd = new scala.util.Random(13)
    // generate VALID streams: first op per live key is I; U/D only on live keys
    val ops = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Option[String], Option[String], Option[Seq[String]])]()
    val live = scala.collection.mutable.Set[Long]()
    for (id <- 1L to 200L) {
      val key = rnd.nextInt(12).toLong
      val v = Some(s"v$id")
      if (!live(key)) { ops += ((id, key, "I", v, v, None)); live += key }
      else rnd.nextInt(4) match {
        case 0 => ops += ((id, key, "D", None, None, None)); live -= key
        case 1 => ops += ((id, key, "U", v, None, Some(Seq("a"))))
        case 2 => ops += ((id, key, "U", None, v, Some(Seq("b"))))
        case _ => ops += ((id, key, "I", v, v, None)) // upsert-style re-I
      }
    }
    val (prefix, delta) = ops.partition(_._1 <= 100L)
    val oneShot = StateOps.applyCdc(cdcDf(ops.toSeq), "key", "id", "operation",
        "changed", Seq("a", "b"))
      .as[(Long, Long, Option[String], Option[String])].collect().toSet
    val snap = StateOps.applyCdc(cdcDf(prefix.toSeq), "key", "id", "operation",
        "changed", Seq("a", "b"))
      .select($"key", $"last_id".as("id"), lit("I").as("operation"),
        $"a", $"b", lit(null).cast("array<string>").as("changed"))
    val composed = StateOps.applyCdc(
        snap.unionByName(cdcDf(delta.toSeq)), "key", "id", "operation",
        "changed", Seq("a", "b"))
      .as[(Long, Long, Option[String], Option[String])].collect().toSet
    assert(composed == oneShot)
  }
}
