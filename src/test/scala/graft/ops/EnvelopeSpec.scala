package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Envelope codec: mandatory version, tri-state payload semantics. */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("decode: valid envelope round-trips meta and payload") {
    // Reference wire shape: $version is a number, $changed a real array.
    val json =
      """{"Metadata":{"Sync":{"Version":42,"Type":"Diff","ReasonCode":0}},
        |"Data":[{"$operation":"U","$version":41,"$changed":["steps"],"steps":"12"},
        |        {"$operation":"D","$version":42,"$changed":null,"id":"7"}]}""".stripMargin
    val got = Envelope.decode(Seq(json).toDF("j"), "j").orderBy("version")
    val rows = got.select($"envelope_version", $"operation", $"version").as[(Long, String, Long)].collect()
    assert(rows.toSeq == Seq((42L, "U", 41L), (42L, "D", 42L)))
    val payload = got.filter($"operation" === "U").select($"payload").as[Map[String, String]].head()
    assert(payload == Map("steps" -> "12"))
    val changed = got.filter($"operation" === "U").select($"changed").as[Seq[String]].head()
    assert(changed == Seq("steps"))
  }

  test("decode: missing Metadata.Sync.Version fails the batch (hard failure)") {
    val bad = Seq("""{"Metadata":{"Sync":{"Type":"Diff"}},"Data":[]}""").toDF("j")
    val ex = intercept[Exception] {
      Envelope.decode(bad, "j").collect()
    }
    assert(ex.getMessage.contains("mandatory"))
  }

  test("decode: tri-state — absent key, null value, present value are distinct") {
    val json =
      """{"Metadata":{"Sync":{"Version":1,"Type":"Diff","ReasonCode":0}},
        |"Data":[{"$operation":"U","$version":1,"$changed":["a","b"],"a":null,"b":"5"}]}""".stripMargin
    val payload = Envelope.decode(Seq(json).toDF("j"), "j")
      .select($"payload").as[Map[String, String]].head()
    // "a" present-with-null (cleared), "b" present (set), "c" absent (untouched)
    assert(payload.contains("a") && payload("a") == null)
    assert(payload("b") == "5")
    assert(!payload.contains("c"))
  }

  test("encode/decode round-trip preserves order by version") {
    val rows = Seq(
      (1L, "I", 3L, Map("v" -> "c")),
      (1L, "I", 1L, Map("v" -> "a")),
      (1L, "U", 2L, Map("v" -> "b"))
    ).toDF("g", "operation", "version", "payload")
      .withColumn("changed", lit(null).cast("array<string>"))
    val enc = Envelope.encode(rows, "g")
    assert(enc.count() == 1)
    val decoded = Envelope.decode(enc, "envelope_json")
    assert(decoded.select("envelope_version").distinct().as[Long].head() == 3L)
    // Data array was ordered by version inside the envelope JSON.
    val js = Envelope.encode(rows, "g").select("envelope_json").as[String].head()
    val posA = js.indexOf("\"a\"")
    val posB = js.indexOf("\"b\"")
    val posC = js.indexOf("\"c\"")
    assert(posA < posB && posB < posC)
  }

  test("stripNulls drops cleared keys before serialization") {
    val df = Seq(1).toDF("x").select(
      Envelope.stripNulls(map(lit("a"), lit(null).cast("string"), lit("b"), lit("1"))).as("m"))
    assert(df.as[Map[String, String]].head() == Map("b" -> "1"))
  }
}
