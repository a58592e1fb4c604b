package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[DedupOps.winnowFingerprints]] against a driver-side reference
  * model built from the engine's own shingle primitives: sliding-window
  * minima over the ordered shingle-hash list, deduplicated. Also pins the
  * winnowing guarantees the operator exists for. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "short doc"),                       // < 3 tokens -> whole-text hash
    (3L, "one two three"),                   // exactly one shingle
    (4L, "a b c d e f"),                     // 4 shingles = one full window
    (5L, "x y z x y z x y z x y z x y z")    // periodic: heavy dedup
  ).toDF("doc_id", "text")

  /** Reference: ordered shingle hashes via the engine's shingles()/hash60
    * column functions evaluated per doc, then a Scala sliding-window min. */
  private def reference(w: Int): Map[Long, Set[Long]] = {
    val hashed = docs.select(col("doc_id"),
      transform(DedupOps.shingles(col("text")),
        s => DedupOps.hash60(s) % DedupOps.MersennePrime31).as("hs"))
      .as[(Long, Seq[Long])].collect()
    hashed.map { case (id, hs) =>
      id -> hs.iterator.sliding(math.min(w, hs.size)).withPartial(false)
        .map(_.min).toSet
    }.toMap
  }

  test("winnow fingerprints equal the sliding-min reference on every doc shape") {
    val got = DedupOps.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref = reference(4)
    assert(got.keySet == ref.keySet, "every doc emits fingerprints")
    got.keys.foreach(id => assert(got(id) == ref(id), s"doc $id"))
  }

  test("shingleHashRows kernel rows equal the SQL-form expression chain (r18)") {
    // The pre-r18 formulation: index explode + per-position
    // hash60(concat_ws(...)) % P — the exact expression chain the oracles
    // replay. The native shingle_hashes path must emit the same multiset
    // of (id, hash) rows, including the whole-doc-hash fallback.
    val P = DedupOps.MersennePrime31
    val ref = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        (DedupOps.hash60(TextOps.normalize(col("text"))) % P).as("_doc_h"),
        TextOps.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("_doc_h"), col("_toks"),
        explode(sequence(lit(0), greatest(size(col("_toks")) - 3, lit(0)))).as("_idx"))
      .select(col("doc_id"),
        when(size(col("_toks")) >= 3,
          DedupOps.hash60(concat_ws(" ",
            expr("element_at(_toks, _idx + 1)"),
            expr("element_at(_toks, _idx + 2)"),
            expr("element_at(_toks, _idx + 3)"))) % P)
          .otherwise(col("_doc_h")).as("_h"))
      .as[(Long, Long)].collect().sorted.toSeq
    val got = DedupOps.shingleHashRows(docs, "doc_id", "text")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == ref)
    // and on real corpus text
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val refC = corpus.repartition(col("doc_id"))
      .select(col("doc_id"),
        (DedupOps.hash60(TextOps.normalize(col("text"))) % P).as("_doc_h"),
        TextOps.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("_doc_h"), col("_toks"),
        explode(sequence(lit(0), greatest(size(col("_toks")) - 3, lit(0)))).as("_idx"))
      .select(col("doc_id"),
        when(size(col("_toks")) >= 3,
          DedupOps.hash60(concat_ws(" ",
            expr("element_at(_toks, _idx + 1)"),
            expr("element_at(_toks, _idx + 2)"),
            expr("element_at(_toks, _idx + 3)"))) % P)
          .otherwise(col("_doc_h")).as("_h"))
      .as[(Long, Long)].collect().sorted.toSeq
    val gotC = DedupOps.shingleHashRows(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(gotC == refC)
  }

  test("shingleHashRowsDistinctPerDoc == shingleHashRows + per-doc distinct (r18)") {
    // row-local array_distinct must produce exactly the distinct (id, _h)
    // set — incl. the whole-doc-hash fallback rows and docs whose shingles
    // repeat (doc 5's periodic text)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(150)
    Seq(docs, corpus).foreach { d =>
      val ref = DedupOps.shingleHashRows(d, "doc_id", "text")
        .distinct().as[(Long, Long)].collect().sorted.toSeq
      val got = DedupOps.shingleHashRowsDistinctPerDoc(d, "doc_id", "text")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == ref)
    }
  }

  test("density and containment guarantees: fingerprints are a subset of " +
    "shingle hashes and at most one per window start") {
    val fps = DedupOps.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = docs.select(col("doc_id"),
      transform(DedupOps.shingles(col("text")),
        s => DedupOps.hash60(s) % DedupOps.MersennePrime31).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    all.foreach { case (id, hs) =>
      assert(fps(id).subsetOf(hs.toSet), s"doc $id: fingerprints come from shingles")
      assert(fps(id).size <= math.max(hs.size - 4 + 1, 1), s"doc $id: density bound")
    }
    // identical spans share a fingerprint: docs 1 and a copy must collide
    val pair = Seq((10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "PREFIX tokens then the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val got = DedupOps.winnowFingerprints(pair, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(10L).intersect(got(11L)).nonEmpty,
      "a shared >= w+k-1-token span must share at least one fingerprint")
  }
}
