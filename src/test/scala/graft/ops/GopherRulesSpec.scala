package graft.ops

import graft.SparkSpec

/** TextOps.gopherRules — each published rule violated by exactly one
  * planted document, plus the integer-ppm edge arithmetic. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextOps.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getValuesMap[Any](r.schema.fieldNames)).toMap

  test("each rule is violated by exactly its planted document") {
    val clean = (1 to 15).map(i => s"the quick brown word$i with").mkString(" ") // 75 words
    val fixtures = Seq(
      (0L, clean),                                              // passes all
      (1L, "the short and with doc"),                           // < 50 words
      (2L, (1 to 60).map(_ => "a").mkString(" ") + " the with"),// mean len < 3
      (3L, clean + " " + "#" * 60),                             // symbol ratio > 10%
      (4L, (1 to 9).map(i => s"- bullet $i").mkString("\n") + "\nplain"), // 90% bullets
      (5L, "one line...\ntwo...\nthree plain\nfour plain"),     // 50% ellipsis lines
      (6L, (1 to 60).map(i => s"$i$i").mkString(" ") + " the with"), // alpha < 80%
      (7L, (1 to 60).map(i => s"word$i").mkString(" ")),        // no gopher stopwords
      (8L, "")                                                  // empty
    )
    val got = run(fixtures)
    def flags(id: Long): Map[String, Boolean] =
      got(id).collect { case (k, v: Boolean) => k -> v }.toMap
    assert(flags(0L)("passes"), s"clean doc must pass: ${got(0L)}")
    assert(!flags(1L)("r_word_count") && flags(1L)("r_mean_word_len"))
    assert(!flags(2L)("r_mean_word_len"), s"1-char words: ${got(2L)}")
    assert(!flags(3L)("r_symbol"), s"hash-heavy: ${got(3L)}")
    assert(!flags(4L)("r_bullet") && flags(0L)("r_bullet"))
    assert(!flags(5L)("r_ellipsis") && flags(4L)("r_ellipsis"))
    assert(!flags(6L)("r_alpha"), s"digit words: ${got(6L)}")
    assert(!flags(7L)("r_stopwords") && flags(0L)("r_stopwords"))
    assert(!flags(8L)("passes") && got(8L)("n_words") == 0L)
    Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).foreach(id =>
      assert(!flags(id)("passes"), s"doc $id must fail overall"))
  }

  test("ppm arithmetic is exact truncating-integer") {
    val got = run(Seq(
      (0L, "alpha beta 123"),          // 3 words, 2 alphabetic
      (1L, "l1\nl2...\nl3")))          // 3 lines, 1 ellipsis-ended
    assert(got(0L)("alpha_word_ppm") == 666666L, s"${got(0L)}")
    assert(got(1L)("ellipsis_line_ppm") == 333333L, s"${got(1L)}")
    assert(got(0L)("n_words") == 3L && got(0L)("word_chars") == 12L)
  }

  test("newline-led text strips by regex, not trim (words never include an empty token)") {
    val got = run(Seq((0L, "\n\nthe word and more with here\n")))
    assert(got(0L)("n_words") == 6L, s"${got(0L)}")
    assert(got(0L)("alpha_word_ppm") == 1000000L)
  }
}
