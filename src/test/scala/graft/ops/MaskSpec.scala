package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column-mask / changed-detection semantics
  * (02-stored-procedure.postgres.column.sql:81-133). */
class MaskSpec extends SparkSpec {
  import spark.implicits._

  test("P4/P5: masked column emitted on I, unknown mask, or named in mask") {
    val df = Seq(
      ("I", null, "x1"),                 // insert: always emitted
      ("U", Seq("a"), "x2"),             // update, 'a' changed: emitted
      ("U", Seq("b"), "x3"),             // update, only 'b' changed: NOT emitted
      ("U", null, "x4")                  // pre-tracking row (mask unknown): emitted
    ).toDF("op", "changed", "a")
    val got = df.select(Mask.maskedColumn($"op", $"changed", "a", $"a").as("a"))
      .as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("x1"), Some("x2"), None, Some("x4")))
  }

  test("P4/P5: no-op updates (empty mask) are suppressed") {
    val df = Seq(
      ("I", null, "v"), ("U", Seq("a"), "v"), ("U", Seq.empty[String], "v"), ("D", null, null: String)
    ).toDF("operation", "changed", "a")
    val got = Mask.maskProjection(df, Seq("a"))
    assert(got.count() == 3) // the empty-mask U row dropped
  }

  test("P6: changedMask is null-safe per column") {
    val df = Seq((null: String, "x", "same", "same", null: String, null: String))
      .toDF("o1", "n1", "o2", "n2", "o3", "n3")
    val got = df.select(Mask.changedMask(Seq(
      ("c1", $"o1", $"n1"),   // null -> x      : changed
      ("c2", $"o2", $"n2"),   // same -> same   : unchanged
      ("c3", $"o3", $"n3")    // null -> null   : unchanged (null-safe)
    )).as("m")).as[Seq[String]].head()
    assert(got == Seq("c1"))
  }

  test("P6/J2: detectChanges marks first version I, diffs the rest, drops no-ops") {
    val log = Seq(
      (1L, 1L, "a", 10), (1L, 2L, "a", 10), (1L, 3L, "b", 10), (1L, 4L, "b", 20)
    ).toDF("key", "ver", "s", "n")
    val got = Mask.detectChanges(log, "key", "ver", Seq("s", "n"))
      .select($"ver", $"operation", $"changed").orderBy("ver")
      .as[(Long, String, Seq[String])].collect()
    // ver=2 is a no-op update → suppressed
    assert(got.toSeq == Seq((1L, "I", null), (3L, "U", Seq("s")), (4L, "U", Seq("n"))))
  }

  test("J1: deletes survive the change-table outer join with null payload") {
    val changes = Seq((1L, "U"), (2L, "D")).toDF("id", "operation")
    val base = Seq((1L, "alive")).toDF("id", "payload") // row 2 already deleted
    val got = Mask.changeOuterJoin(changes, base, "id").orderBy("id")
      .select($"operation", $"payload").as[(String, Option[String])].collect()
    assert(got.toSeq == Seq(("U", Some("alive")), ("D", None)))
  }

  test("A4: mask rendered as quoted JSON array") {
    val df = Seq(Tuple1(Seq("a", "b")), Tuple1(Seq.empty[String]), Tuple1(null: Seq[String]))
      .toDF("changed")
    val got = df.select(Mask.maskAsJsonArray($"changed").as("j")).as[Option[String]].collect()
    assert(got.toSeq == Seq(Some("""["a","b"]"""), Some("[]"), None))
  }
}
