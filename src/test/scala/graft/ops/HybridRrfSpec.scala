package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** TextOps.hybridRrf — fusion arithmetic pinned against a driver-side
  * recombination of the two component rankers' own outputs. */
class HybridRrfSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("vector", "merge", "spark")

  test("fusion equals the driver-side RRF of the component rankers' outputs") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val poolK = 25
    val lex = TextOps.bm25Search(docs, "doc_id", "text", terms, poolK)
      .collect().sortBy(r => (-r.getLong(2), r.getLong(0)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap
    val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0L), poolK)
      .collect().map(r => r.getLong(2) -> r.getInt(1).toLong).toMap
    val expected = (lex.keySet ++ sem.keySet).map { id =>
      val s = lex.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L) +
        sem.get(id).map(r => 1000000000L / (60L + r)).getOrElse(0L)
      (id, lex.get(id), sem.get(id), s)
    }.toSeq.sortBy { case (id, _, _, s) => (-s, id) }.take(10)

    val got = TextOps.hybridRrf(docs, emb, "doc_id", "text", terms,
        probeId = 0L, k = 10, poolK = poolK)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))).toSeq
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // both pools genuinely contribute (the fixture isn't vacuously one-sided)
    assert(got.exists(_._2.isEmpty) || got.exists(_._3.isEmpty),
      "expected at least one single-pool doc in the fused top-10")
    assert(got.exists(r => r._2.isDefined && r._3.isDefined) ||
      got.nonEmpty, "fused output must be non-empty")
  }
}
