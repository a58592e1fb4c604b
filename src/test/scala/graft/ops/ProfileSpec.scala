package graft.ops

import graft.SparkSpec

/** Pins [[Profile.profile]]: exact null/distinct accounting per column,
  * string-rendering min/max (display-range semantics — lexicographic, as
  * the oracle's CAST(c AS VARCHAR) replays), one row per column. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distinct, and lexicographic range per column") {
    val df = Seq(
      (Some(1L), Some("b")),
      (Some(2L), None),
      (Some(10L), Some("a")),
      (None, Some("a"))
    ).toDF("id", "tag")
    val got = Profile.profile(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    // nulls excluded from distinct; "10" < "2" lexicographically
    assert(got("id") === (("id", 4L, 1L, 3L, Some("1"), Some("2"))))
    assert(got("tag") === (("tag", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("profile: all-null column yields null range and zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "gone")
    val got = Profile.profile(df, Seq("gone"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().head
    assert(got === (("gone", 2L, 2L, 0L, None, None)))
  }

  test("refIntegrity: orphans and null FKs counted, clean relation reads zero") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val got = Profile.refIntegrity(child, "fk", parent, "pk", "c_p")
      .as[(String, Long, Long, Long)].collect().head
    // 4 child rows; orphan 9 + null FK = 2 orphans = 500000 ppm
    assert(got === (("c_p", 4L, 2L, 500000L)))
    val clean = Profile.refIntegrity(parent, "pk", parent, "pk", "self")
      .as[(String, Long, Long, Long)].collect().head
    assert(clean === (("self", 3L, 0L, 0L)))
  }

  test("refIntegrityMulti: one fact scan reproduces the per-relation audits") {
    val orders = Seq(1L, 2L).toDF("ok")
    val parts = Seq(10L, 11L).toDF("pk")
    val fact = Seq((1L, 10L), (2L, 99L), (7L, 11L), (7L, 99L)).toDF("fo", "fp")
    val fused = Profile.refIntegrityMulti(fact, Seq(
        ("fo", orders, "ok", "f_o"), ("fp", parts, "pk", "f_p")))
      .as[(String, Long, Long, Long)].collect().toSet
    val separate = (
      Profile.refIntegrity(fact, "fo", orders, "ok", "f_o")
        .as[(String, Long, Long, Long)].collect() ++
      Profile.refIntegrity(fact, "fp", parts, "pk", "f_p")
        .as[(String, Long, Long, Long)].collect()).toSet
    assert(fused == separate)
    assert(fused == Set(("f_o", 4L, 2L, 500000L), ("f_p", 4L, 2L, 500000L)))
  }

  test("keySkew: totals ride the one rollup pass; top-k ordered by count desc, key asc") {
    // key 7 -> 4 rows, key 3 -> 2, keys 1,2 -> 1 each (tie broken by key)
    val df = (Seq.fill(4)(7L) ++ Seq.fill(2)(3L) ++ Seq(1L, 2L)).toDF("k")
    val got = Profile.keySkew(df, "k", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._3)
    assert(got.toSeq === Seq(
      (8L, 4L, 1L, 7L, 4L, 500000L),
      (8L, 4L, 2L, 3L, 2L, 250000L),
      (8L, 4L, 3L, 1L, 1L, 125000L)))
  }
}
