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
}
