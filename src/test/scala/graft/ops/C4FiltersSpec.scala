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
}
