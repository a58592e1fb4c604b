package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkPackSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: emails, phones, long digit runs tagged; clean text untouched") {
    val got = Seq(
      "mail me at some.user+x@sub.example.org please",
      "call 555-0199 twice",
      "account 123456789012 overdrawn",
      "nothing sensitive here 12 34"
    ).toDF("t").select(TextOps.redactPii($"t")).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> please")
    assert(got(1) == "call <PHONE> twice")
    assert(got(2) == "account <NUM> overdrawn")
    assert(got(3) == "nothing sensitive here 12 34")
  }

  test("chunkWindows: stride overlap, tail covered, short doc -> one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than window
      (3L, "")                                        // empty -> no rows
    ).toDF("doc_id", "text")
    val got = TextOps.chunkWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val d1 = got(1L)
    // starts 0,2,4,6 cover tokens 1..10: 1 + ceil((10-4)/2) = 4 chunks
    assert(d1.length == 4)
    assert(d1.head._3 == "w1 w2 w3 w4" && d1.head._4 == 4L)
    assert(d1.last._3 == "w7 w8 w9 w10" && d1.last._4 == 4L)
    assert(got(2L).map(c => (c._3, c._4)).toSeq == Seq(("a b c", 3L)))
    assert(!got.contains(3L))
  }

  test("packStream: per-stratum contiguous packing, offsets wrap at seqLen") {
    val docs = Seq(
      ("en", 1L, (1 to 6).map(_ => "x").mkString(" ")),  // 6 tokens
      ("en", 2L, (1 to 5).map(_ => "y").mkString(" ")),  // 5 tokens
      ("en", 3L, "z z"),                                 // 2 tokens
      ("de", 9L, (1 to 9).map(_ => "u").mkString(" "))   // independent stratum
    ).toDF("lang", "doc_id", "text")
    val got = TextOps.packStream(docs, "lang", "doc_id", "text", seqLen = 8)
      .select($"doc_id", $"n_tokens", $"seq_idx", $"seq_offset")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 0L, 0L)), "first doc starts sequence 0 offset 0")
    assert(got(2L) == ((2L, 5L, 0L, 6L)), "second doc starts at cumulative offset 6")
    assert(got(3L) == ((3L, 2L, 1L, 3L)), "11 tokens in -> sequence 1, offset 3")
    assert(got(9L) == ((9L, 9L, 0L, 0L)), "strata pack independently")
  }

  test("repetitionSignals: dup-token / top-bigram / dup-trigram ppm, hand-computed") {
    val docs = Seq(
      (1L, "a a a b"),       // n=4 distinct=2; top bigram (a a)x2; no repeated trigram
      (2L, "x y x y x y"),   // n=6 distinct=2; (x y)x3; (x y x)x2 + (y x y)x2
      (3L, ""),              // empty -> all zeros
      (4L, "p q r s"),       // all-unique; top bigram count 1
      (5L, "z")              // single token: no bigrams/trigrams at all
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 500000L, 1000000L, 0L)))
    assert(got(2L) == ((2L, 6L, 666666L, 1000000L, 1000000L)))
    assert(got(3L) == ((3L, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((4L, 4L, 0L, 500000L, 0L)))
    assert(got(5L) == ((5L, 1L, 0L, 0L, 0L)))
    assert(got.size == 5, "every document appears exactly once")
  }
}
