package graft.functions

import graft.SparkSpec
import graft.ops.{TextOps, Windows}
import org.apache.spark.sql.functions._

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("F1: template substitutes all placeholders; URL variant escapes") {
    val df = Seq(("prod", "my order")).toDF("env", "obj")
    val plain = df.select(Scalars.template(
      lit("x/{environment}/{object}.json"),
      Map("environment" -> $"env", "object" -> $"obj")).as("p")).as[String].head()
    assert(plain == "x/prod/my order.json")
    val url = df.select(Scalars.template(
      lit("http://h/{object}"),
      Map("object" -> $"obj"), urlEscape = true).as("p")).as[String].head()
    assert(url == "http://h/my+order" || url == "http://h/my%20order")
  }

  test("F2: UTC stamp format") {
    val got = Seq(java.sql.Timestamp.valueOf("2024-02-03 04:05:06"))
      .toDF("ts").select(Scalars.utcStamp($"ts").as("s")).as[String].head()
    assert(got == "20240203040506")
  }

  test("F5: gzip round-trips and emits a real gzip stream") {
    val text = "payload payload payload payload payload payload payload"
    val df = Seq(text).toDF("t")
    val gz = df.select(Scalars.gzip($"t".cast("binary")).as("z")).as[Array[Byte]].head()
    assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte) // gzip magic
    assert(gz.length < text.length)                       // compresses
    val back = df.select(Scalars.gunzip(Scalars.gzip($"t".cast("binary"))).cast("string").as("s"))
      .as[String].head()
    assert(back == text)
  }

  test("F9: log-line regex parses ts/level/msg; continuation lines do not match") {
    val df = Seq(
      "2024-01-01 10:00:00 [INFO] started ok",
      "  at some.continuation.Frame(line:1)"
    ).toDF("line")
    val got = df.select(Scalars.logTs($"line").as("ts"), Scalars.logLevel($"line").as("l"),
      Scalars.logMsg($"line").as("m")).as[(String, String, String)].collect()
    assert(got(0) == (("2024-01-01 10:00:00", "INFO", "started ok")))
    assert(got(1) == (("", "", ""))) // no match → continuation
  }

  test("F10/F11: case-insensitive equality and prefix split") {
    val df = Seq((" ProdEnv ", "prodenv", "prodenv_orders")).toDF("a", "b", "k")
    assert(df.select(Scalars.ciEq($"a", $"b").as("x")).as[Boolean].head())
    val obj = df.select(Scalars.objectOfKey($"k", "prodenv").as("o")).as[String].head()
    assert(obj == "orders")
  }

  test("F13: pow2 and 75% pre-warn") {
    val df = Seq((3, 74L), (3, 75L)).toDF("n", "c")
    assert(df.select(Scalars.pow2($"n").as("p")).as[Long].head() == 8L)
    val warn = df.select(Scalars.nearThreshold($"c", 100).as("w")).as[Boolean].collect()
    assert(warn.toSeq == Seq(false, true))
  }

  test("TextOps: normalization and token counting edge cases") {
    val df = Seq("  Héllo,,  WORLD!! 42  ", "", "...").toDF("t")
    val got = df.select(
      TextOps.normalize($"t").as("n"),
      TextOps.tokenCount($"t").as("c")).as[(String, Long)].collect()
    assert(got(0)._1 == "h llo world 42")
    assert(got(0)._2 == 4)
    assert(got(1) == (("", 0L)))
    assert(got(2) == (("", 0L)))
  }

  test("W2: batch numbering partitions per group") {
    val df = (1 to 7).map(i => ("g", i.toLong)).toDF("grp", "id")
    val got = Windows.numberBatches(df, "grp", "id", 3)
      .orderBy("id").select($"batch", $"total_batches").as[(Int, Int)].collect()
    assert(got.map(_._1).toSeq == Seq(0, 0, 0, 1, 1, 1, 2))
    assert(got.forall(_._2 == 3))
  }

  test("A8: cleanup plan marks oldest files beyond the cap") {
    val files = Seq(
      ("e", java.sql.Date.valueOf("2024-01-03"), 50L, 3L),
      ("e", java.sql.Date.valueOf("2024-01-02"), 50L, 2L),
      ("e", java.sql.Date.valueOf("2024-01-01"), 50L, 1L)
    ).toDF("env", "day", "size_bytes", "file_id")
    val got = Windows.cleanupPlan(files, capBytes = 100L)
      .orderBy($"day".desc).select($"delete").as[Boolean].collect()
    assert(got.toSeq == Seq(false, false, true)) // newest two fit, oldest deleted
  }
}
