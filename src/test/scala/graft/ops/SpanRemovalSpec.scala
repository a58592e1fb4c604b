package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** removeDuplicatedSpans — the Lee et al. excision half: keeper election,
  * overlapping-window merge, cross-doc-only contract, keepFirst=false. */
class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  // Doc 0 is a 10-token run; doc 1 embeds the SAME run between unique
  // fillers, so with width=4 the run contributes 7 duplicated windows
  // whose union covers exactly the 10 shared positions in doc 1.
  private val shared = "one two three four five six seven eight nine ten"
  private def fixture = Seq(
    (0L, shared),
    (1L, s"alpha beta $shared gamma"),
    (2L, "completely unique words in this document right here"),
    (3L, "rep rep rep rep rep rep rep rep"), // intra-doc only
    (4L, ""),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  private def run(keepFirst: Boolean = true) =
    DedupOps.removeDuplicatedSpans(fixture, "doc_id", "text",
        width = 4, keepFirst = keepFirst)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("keeper doc keeps the span; every other occurrence is excised; overlaps merge") {
    val got = run()
    assert(got.size == 6, "every input doc returns a row")
    // keeper (lowest (doc, idx)) untouched
    assert(got(0L) == ((shared, 10L, 0L, 0L)))
    // loser: 7 overlapping masked windows excise the 10-token UNION —
    // not 7×4 = 28 — and reassembly stitches the remainder in order
    assert(got(1L) == (("alpha beta gamma", 13L, 10L, 7L)))
    // untouched docs come back as their normalized text
    assert(got(2L) == (("completely unique words in this document right here", 8L, 0L, 0L)))
    // within-doc repetition is NOT cross-doc boilerplate
    assert(got(3L) == (("rep rep rep rep rep rep rep rep", 8L, 0L, 0L)))
    // empty and sub-width docs survive verbatim
    assert(got(4L) == (("", 0L, 0L, 0L)))
    assert(got(5L) == (("tiny doc", 2L, 0L, 0L)))
  }

  test("keepFirst = false excises the keeper occurrence too") {
    val got = run(keepFirst = false)
    assert(got(0L) == (("", 10L, 10L, 7L)), "keeper doc loses the whole run")
    assert(got(1L) == (("alpha beta gamma", 13L, 10L, 7L)))
    assert(got(2L)._3 == 0L && got(3L)._3 == 0L)
  }

  test("token conservation: n_removed + kept token count equals n_tokens") {
    run().values.foreach { case (cleaned, nTok, nRem, _) =>
      val kept = if (cleaned.isEmpty) 0 else cleaned.split(" ").length
      assert(kept + nRem == nTok, s"'$cleaned' kept=$kept rem=$nRem tok=$nTok")
    }
  }

  test("broadcast and shuffle mask-join paths produce identical output") {
    def all(forced: Option[Boolean]) =
      DedupOps.removeDuplicatedSpans(fixture, "doc_id", "text",
          width = 4, broadcastDupSpans = forced)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(all(Some(true)) == all(Some(false)))
  }

  // The r17 native kernel (ExciseSpans) replaced the explode + anti-join +
  // collect_list reassembly — pin its row-local contract directly on the
  // edge cases the operator relies on: unsorted/duplicate starts, window
  // union across touching and nested overlaps, tail clipping, full
  // coverage, and the no-mask fast path.
  test("excise kernel: overlap union, unsorted starts, clipping, full/none coverage") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: String*) =
      new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    def starts(ss: Long*) = new GenericArrayData(ss.toArray[Any])
    def go(toks: Seq[String], ss: Seq[Long], w: Int) = {
      val r = graft.expressions.ExciseSpansCore.excise(arr(toks: _*), starts(ss: _*), w)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
    val t = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    // unsorted + duplicate starts; [4,7] ∪ [2,5] = positions 2..7
    assert(go(t, Seq(4L, 2L, 4L), 4) == (("a b", 2L)))
    // touching (not overlapping) windows mask their exact union
    assert(go(t, Seq(0L, 2L), 2) == (("e f g h", 4L)))
    // staggered overlap: [1,5] ∪ [2,6] masks 1..6
    assert(go(t, Seq(1L, 2L), 5) == (("a h", 2L)))
    // tail clip: a start whose window runs past the end masks to the end only
    assert(go(t, Seq(6L), 4) == (("a b c d e f", 6L)))
    // full coverage reassembles to the empty string
    assert(go(t, Seq(0L, 4L), 4) == (("", 0L)))
    // no masks: fast path rejoins every token
    assert(go(t, Seq(), 4) == (("a b c d e f g h", 8L)))
    // empty doc stays empty whatever the starts claim
    assert(go(Seq(), Seq(0L), 4) == (("", 0L)))
  }
}
