package graft.ops

import graft.SparkSpec

/** TextOps.unicodeClean + the native nfc_normalize expression — the
  * unicode-hygiene semantics the ASCII oracle corpus cannot exercise. */
class UnicodeCleanSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café résumé" // NFC form, 11 chars
  private val decomposed = java.text.Normalizer.normalize(
    composed, java.text.Normalizer.Form.NFD) // NFD form, 14 chars

  private def run(rows: Seq[(Long, String)]) =
    TextOps.unicodeClean(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap

  test("NFC composes decomposed text; composed and ASCII text pass through unchanged") {
    val got = run(Seq(
      (0L, decomposed),
      (1L, composed),
      (2L, "plain ascii text.")))
    assert(got(0L)._1 == composed, "NFD input must compose to the NFC form")
    assert(got(0L)._5 && got(0L)._3 == decomposed.length.toLong &&
      got(0L)._4 == composed.length.toLong,
      s"len ${decomposed.length} -> ${composed.length}: ${got(0L)}")
    assert(got(1L) == ((composed, 0L, composed.length.toLong,
      composed.length.toLong, false)))
    assert(!got(2L)._5 && got(2L)._1 == "plain ascii text.")
  }

  test("zero-width characters are stripped and counted before composition") {
    val zw = "a​b‌c‍d﻿e"
    val got = run(Seq((0L, zw)))(0L)
    assert(got._1 == "abcde" && got._2 == 4L && got._5, s"$got")
  }

  test("cleaning unifies the dedup fingerprint of composed and decomposed twins") {
    // The motivating property: the SAME logical text in two encodings
    // must hash identically after the hygiene pass, or exact dedup
    // silently keeps both copies.
    import org.apache.spark.sql.functions._
    val cleaned = TextOps.unicodeClean(
      Seq((0L, composed), (1L, decomposed + "​")).toDF("doc_id", "text"),
      "doc_id", "text")
    val fps = cleaned
      .select(TextOps.fingerprint(col("cleaned_text")).as("fp"))
      .as[String].collect()
    assert(fps.distinct.length == 1,
      "composed and decomposed twins must share one fingerprint after cleaning")
  }
}
