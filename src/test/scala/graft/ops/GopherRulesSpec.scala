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

  test("randomized messy text matches a driver-side reference on every metric") {
    // Independent reimplementation of each metric in plain Scala; the
    // random pool mixes digits, '#'-runs, bullets, ellipsis endings,
    // blank lines, and leading whitespace — the regex/lambda edge cases.
    def reference(text: String): (Long, Long, Long, Long, Long, Long, Long) = {
      val stripped = text.replaceAll("^\\s+|\\s+$", "")
      val words =
        if (stripped.isEmpty) Array.empty[String] else stripped.split("\\s+")
      val nWords = words.length.toLong
      val wordChars = text.replaceAll("\\s+", "").length.toLong
      val nSymbols = text.count(_ == '#').toLong +
        (text.length - text.replace("...", "").length) / 3 +
        text.count(_ == '…').toLong
      val lines = text.split("\n", -1)
      val bullet = lines.count(l =>
        l.dropWhile(_ == ' ').headOption.exists(Set('-', '*', '•'))).toLong
      val ell = lines.count { l =>
        val r = l.reverse.dropWhile(_ == ' ').reverse
        r.endsWith("...") || r.endsWith("…")
      }.toLong
      val alpha = words.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      val toks = if (norm.isEmpty) Set.empty[String] else norm.split(" ").toSet
      val stops = toks.intersect(TextOps.GopherStopwords.toSet).size.toLong
      (nWords, wordChars,
        nSymbols * 1000000L / math.max(nWords, 1L),
        bullet * 1000000L / lines.length,
        ell * 1000000L / lines.length,
        alpha * 1000000L / math.max(nWords, 1L),
        stops)
    }
    val rnd = new scala.util.Random(0xC0FFEEL)
    val pool = Vector("the", "word", "123", "###", "a", "with", "…",
      "graph...", "x9y", "-")
    val docs = (0L until 25L).map { id =>
      val lines = Vector.fill(1 + rnd.nextInt(4)) {
        val lead = if (rnd.nextBoolean()) "  " else ""
        lead + Vector.fill(rnd.nextInt(8))(pool(rnd.nextInt(pool.length)))
          .mkString(" ")
      }
      id -> lines.mkString("\n")
    }
    val got = run(docs)
    docs.foreach { case (id, text) =>
      val (nw, wc, sym, bul, ell, alp, st) = reference(text)
      val g = got(id)
      assert((g("n_words"), g("word_chars"), g("symbol_ppm"),
        g("bullet_line_ppm"), g("ellipsis_line_ppm"), g("alpha_word_ppm"),
        g("n_stop_hits")) == ((nw, wc, sym, bul, ell, alp, st)),
        s"doc $id ${text.replace("\n", "\\n")}: $g vs reference " +
          s"($nw,$wc,$sym,$bul,$ell,$alp,$st)")
    }
  }
}
