package graft.ops

import graft.SparkSpec

/** TextOps.c4Filters — line retention, reassembly, and the doc flags. */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    TextOps.c4Filters(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getValuesMap[Any](r.schema.fieldNames)).toMap

  test("keeps only terminal-punctuation lines with >= 5 words; reassembles in order") {
    val text = Seq(
      "this line has five words.",        // kept
      "short line here.",                 // < 5 words -> dropped
      "no terminal punctuation on this line", // dropped
      "does this question line carry five words?", // kept
      "a quoted ending with enough words here\"",  // kept
      "").mkString("\n")
    val got = run(Seq((0L, text)))(0L)
    assert(got("n_lines") == 6L && got("n_kept_lines") == 3L)
    assert(got("cleaned_text") == Seq(
      "this line has five words.",
      "does this question line carry five words?",
      "a quoted ending with enough words here\"").mkString("\n"))
    // sentences = terminal '.', '!', '?' occurrences in the CLEANED text
    assert(got("n_sentences") == 2L, s"$got")
    assert(got("keep_doc") == false, "2 sentences < 3")
  }

  test("lorem ipsum and curly braces flag the document out") {
    val ok = "one full sentence with enough words here. and another one right after that. plus a third sentence to clear the bar."
    val got = run(Seq(
      (0L, ok),
      (1L, ok + " Lorem Ipsum dolor sit."),
      (2L, ok + " function() { return; }")))
    assert(got(0L)("keep_doc") == true && got(0L)("n_sentences") == 3L)
    assert(got(1L)("has_lorem_ipsum") == true && got(1L)("keep_doc") == false,
      "case-insensitive lorem ipsum match")
    assert(got(2L)("has_brace") == true && got(2L)("keep_doc") == false)
  }

  test("empty and fully-filtered docs come back with empty cleaned_text") {
    val got = run(Seq((0L, ""), (1L, "no punct here\nnor here")))
    Seq(0L, 1L).foreach { id =>
      assert(got(id)("cleaned_text") == "" && got(id)("n_kept_lines") == 0L &&
        got(id)("keep_doc") == false, s"$id: ${got(id)}")
    }
  }

  test("randomized messy docs match a driver-side reference on every column") {
    def reference(text: String): (String, Long, Long, Long, Boolean, Boolean, Boolean) = {
      val lines = text.split("\n", -1)
      val kept = lines.filter { l =>
        val r = l.reverse.dropWhile(_ == ' ').reverse
        val stripped = l.replaceAll("^\\s+|\\s+$", "")
        val words = if (stripped.isEmpty) Array.empty[String]
          else stripped.split("\\s+")
        (r.endsWith(".") || r.endsWith("!") || r.endsWith("?") ||
          r.endsWith("\"")) && words.length >= 5
      }
      val cleaned = kept.mkString("\n")
      val sentences = cleaned.count(c => c == '.' || c == '!' || c == '?').toLong
      val lorem = text.toLowerCase.contains("lorem ipsum")
      val brace = text.contains("{")
      (cleaned, lines.length.toLong, kept.length.toLong, sentences,
        lorem, brace, sentences >= 3 && !lorem && !brace)
    }
    val rnd = new scala.util.Random(0xBEEFL)
    val words = Vector("the", "word", "lorem", "ipsum", "x{y", "five", "is.",
      "go!", "eh?", "quote\"")
    val docs = (0L until 25L).map { id =>
      id -> Vector.fill(1 + rnd.nextInt(4)) {
        Vector.fill(rnd.nextInt(8))(words(rnd.nextInt(words.length)))
          .mkString(" ") + (if (rnd.nextBoolean()) " " else "")
      }.mkString("\n")
    }
    val got = run(docs)
    docs.foreach { case (id, text) =>
      val (cl, nl, nk, ns, lo, br, kd) = reference(text)
      val g = got(id)
      assert((g("cleaned_text"), g("n_lines"), g("n_kept_lines"),
        g("n_sentences"), g("has_lorem_ipsum"), g("has_brace"),
        g("keep_doc")) == ((cl, nl, nk, ns, lo, br, kd)),
        s"doc $id ${text.replace("\n", "\\n")}: $g")
    }
  }
}
