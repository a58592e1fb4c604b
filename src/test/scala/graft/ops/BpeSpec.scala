package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE trainer vs a pure-Scala reference implementation, plus
  * the wrapped-string encoding invariants the oracle relies on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE (Sennrich et al. 2016 alg. 1): pair counts over the
    * word-frequency table, argmax with (cnt desc, lhs asc, rhs asc)
    * tie-break, left-to-right non-overlapping merge application. */
  private def refTrain(wordFreqs: Map[String, Long], n: Int): Seq[Bpe.Merge] = {
    var vocab: Map[Seq[String], Long] =
      wordFreqs.map { case (w, f) => w.map(_.toString).toSeq -> f }
    val out = Seq.newBuilder[Bpe.Merge]
    for (rank <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += Bpe.Merge(rank, l, r, c)
        vocab = vocab.map { case (syms, f) =>
          val merged = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }
      }
    }
    out.result()
  }

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("wrapped encoding: wrapWord round-trips and merge application is left-to-right non-overlapping") {
    val df = Seq("aaa", "hello").toDF("word")
      .select(col("word"), Bpe.wrapWord(col("word")).as("w"))
    val wrapped = df.as[(String, String)].collect().toMap
    assert(wrapped("aaa") == "|a||a||a|")
    assert(wrapped("hello") == "|h||e||l||l||o|")
    // the BPE-critical case: merging (a,a) on "aaa" gives [aa, a], never [a, aa]
    val m = Bpe.Merge(1, "a", "a", 0L)
    val applied = df.select(Bpe.applyMerge(col("w"), m).as("w"))
      .as[String].collect().toSet
    assert(applied.contains("|aa||a|"), s"got $applied")
  }

  test("pairCounts matches the naive per-word pair enumeration") {
    val docs = docsOf(Seq("ab ab cd", "ab"))
    val vocab = Bpe.initialVocab(docs, "text")
    val pc = Bpe.pairCounts(vocab).as[(String, String, Long)].collect()
      .map { case (l, r, c) => ((l, r), c) }.toMap
    // wordFreqs: ab->3, cd->1; pairs over the VOCAB are freq-weighted
    assert(pc == Map(("a", "b") -> 3L, ("c", "d") -> 1L), s"got $pc")
  }

  test("train equals the reference implementation on a fixture with ties and chained merges") {
    // 'le' then 'lele' chains a learned symbol into a later pair; 'xy'/'xz'
    // tie on count and must break lexicographically
    val texts = Seq(
      "lelele lele banana banana", "lele le banana", "xy xz xy xz", "le lelele")
    val docs = docsOf(texts)
    val wf = Bpe.wordFreqs(docs, "text").as[(String, Long)].collect().toMap
    val expected = refTrain(wf, 8)
    val got = Bpe.train(docs, "text", 8)
    assert(got == expected, s"\ngot      $got\nexpected $expected")
    assert(got.size == 8)
    // at least one merge must consume a previously-merged symbol
    val alphabet = got.map(m => (m.lhs, m.rhs))
    assert(alphabet.exists { case (l, r) => l.length > 1 || r.length > 1 },
      s"fixture must force a chained merge: $alphabet")
  }

  test("train is deterministic across runs and stops when pairs are exhausted") {
    val docs = docsOf(Seq("ab", "ab", "cd"))
    val a = Bpe.train(docs, "text", 50)
    val b = Bpe.train(docs, "text", 50)
    assert(a == b)
    // vocabulary collapses to single symbols: ab, cd — then no pairs remain
    assert(a.size < 50, s"must exhaust, got ${a.size} merges")
    assert(a.map(m => m.lhs + m.rhs).toSet == Set("ab", "cd"))
  }

  test("segment applies the merge table map-only and matches the reference segmentation") {
    val docs = docsOf(Seq("lelele lele banana", "banana le"))
    val merges = Bpe.train(docs, "text", 6)
    val seg = docs.select(col("doc_id"), Bpe.segment(col("text"), merges).as("syms"))
    val bySeg = seg.as[(Long, Seq[Seq[String]])].collect().toMap
    // reference: apply merges in rank order per word
    def refSeg(word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString).toSeq
      for (m <- merges.sortBy(_.rank)) {
        val merged = Seq.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.lhs && syms(i + 1) == m.rhs) {
            merged += (m.lhs + m.rhs); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.result()
      }
      syms
    }
    assert(bySeg(0L) == Seq(refSeg("lelele"), refSeg("lele"), refSeg("banana")))
    assert(bySeg(1L) == Seq(refSeg("banana"), refSeg("le")))
    // reassembly invariant: concatenating symbols restores each word
    assert(bySeg.values.flatten.forall(_.mkString.nonEmpty))
  }

  test("flat whole-text segmentation equals the per-word HOF form") {
    val docs = docsOf(Seq("lelele lele banana", "banana le", "a", "", "x2y z9"))
    val merges = Bpe.train(docs, "text", 6)
    val both = docs.select(col("doc_id"),
      Bpe.segment(col("text"), merges).as("segs"),
      Bpe.segmentTextFlat(TextOps.normalize(col("text")), merges).as("flat"))
      .as[(Long, Seq[Seq[String]], String)].collect()
    for ((id, segs, flat) <- both) {
      val fromFlat =
        if (flat.isEmpty) Seq.empty
        else flat.split(" ").toSeq.map(w =>
          w.stripPrefix("|").stripSuffix("|").split("\\|\\|").toSeq)
      assert(fromFlat == segs, s"doc $id: flat='$flat' vs segs=$segs")
      // and the flat symbol count matches the array form
      val n = segs.map(_.size).sum
      val viaCount = docs.filter(col("doc_id") === id)
        .select(Bpe.flatSymbolCount(
          Bpe.segmentTextFlat(TextOps.normalize(col("text")), merges),
          lit(segs.size.toLong)))
        .as[Long].collect().head
      assert(viaCount == n, s"doc $id symbol count: $viaCount vs $n")
    }
  }

  test("native bpe_sym_count equals the flat replace-chain count (r20)") {
    // cascade-heavy fixture: merges built on earlier merges, overlapping
    // repeats (aaa under (a,a) → [aa, a] — the left-to-right contract),
    // single-char words, empty docs, and a random tail
    val rnd = new scala.util.Random(41)
    val base = Seq("lelele lele banana", "banana le", "a", "", "x2y z9",
      "aaaa aaa aa a", "abab ababab ab", "mississippi mississauga")
    val docs = docsOf(base ++ (1 to 40).map(_ =>
      (0 until rnd.nextInt(12)).map(_ =>
        ("le" * (1 + rnd.nextInt(3))) + Seq("", "a", "na", "ba")(rnd.nextInt(4)))
        .mkString(" ")))
    for (k <- Seq(0, 1, 6, 12)) {
      val merges = Bpe.train(docs, "text", k)
      val both = docs
        .select(col("doc_id"), TextOps.normalize(col("text")).as("_n"),
          TextOps.tokens(col("text")).as("_t"))
        .select(col("doc_id"),
          Bpe.symCount(col("_n"), merges).as("native"),
          when(length(col("_n")) === 0, 0L).otherwise(
            Bpe.flatSymbolCount(Bpe.segmentTextFlat(col("_n"), merges),
              size(col("_t")).cast("long"))).as("flat"))
        .as[(Long, Long, Long)].collect()
      for ((id, native, flat) <- both)
        assert(native == flat, s"doc $id diverges at $k merges: $native vs $flat")
    }
  }
}
