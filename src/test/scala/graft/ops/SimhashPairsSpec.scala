package graft.ops

import graft.SparkSpec

class SimhashPairsSpec extends SparkSpec {
  import spark.implicits._

  test("banded pairs equal brute-force hamming<=3 pairs (pigeonhole recall)") {
    // Exact dup (1,2) guarantees a non-vacuous expected set; (3) is a
    // one-word edit (its 60-bit hamming is data-dependent — one token of
    // thirteen flips ~0.1 of positions in expectation, so it may or may
    // not pass the threshold; the brute force decides); unrelated fillers.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox leaps over the lazy dog again and again today"),
      (4L, "completely different content about databases and indexes and scans"),
      (5L, "yet another unrelated snippet concerning weather patterns in spring"),
      (6L, "financial markets closed higher amid broad gains in technology stocks")
    ).toDF("doc_id", "text")
    val got = DedupOps.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet

    val sh = DedupOps.simhashWide(docs, "doc_id", "text", 60)
      .as[(Long, Long)].collect().toMap
    val ids = sh.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    // hamming <= 3 over 4 bands of the 60-bit fingerprint → at least one
    // band identical (pigeonhole), so banding loses nothing vs brute force
    assert(got == expected)
    assert(expected.contains((1L, 2L, 0L)), "the exact dup pair is always present")
  }

  test("hamming is exact and pairs are canonical (id_a < id_b), no self-pairs") {
    val docs = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma delta"), // exact dup → hamming 0
      (12L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val got = DedupOps.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 11L, 0L), (10L, 12L, 0L), (11L, 12L, 0L)))
  }
}
