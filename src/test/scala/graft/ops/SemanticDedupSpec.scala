package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SemDeDup semantics pinned against a driver-side reference model plus
  * the structural guarantees the 100 TB posture depends on. */
class SemanticDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  private def collected = Similarity.semanticDedup(emb, minCos = 0.2,
      numCells = 16, iterations = 0)
    .select(col("vec_id"), col("cluster"), col("c_milli"), col("dropped"))
    .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
    .toMap

  test("semanticDedup matches a driver-side reference model exactly") {
    // Re-derive the whole pipeline in plain Scala: quantize, argmax cell
    // assignment (ties to lowest cid), centroid-cosine milli rank, pair
    // threshold, dominance rule — and demand bit-equality.
    val vecs = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cells = Similarity.firstK(emb, 16)
    val assigned = vecs.map { case (id, v) =>
      val (cid, cv) = cells.minBy { case (c, cv) => (-dot(v, cv), c) }
      val n2 = dot(v, v)
      val cMilli = math.floor(dot(v, cv) * 1000 / math.sqrt(n2.toDouble * dot(cv, cv))).toLong
      (id, cid, v, n2, cMilli)
    }
    val expected = assigned.map { case (id, cid, v, n2, cMilli) =>
      val dropped = assigned.exists { case (oid, ocid, ov, on2, ocMilli) =>
        oid != id && ocid == cid &&
          dot(v, ov) > 0.2 * math.sqrt(n2.toDouble * on2) &&
          (ocMilli < cMilli || (ocMilli == cMilli && oid < id))
      }
      id -> ((cid, cMilli, dropped))
    }.toMap
    assert(collected == expected, "semanticDedup diverged from the reference model")
  }

  test("every nonempty cell keeps at least one vector (the diversity anchor survives)") {
    // The cell's best-ranked vector (lowest c_milli, tie lowest id) has no
    // better same-cell neighbor by construction, so it can never drop —
    // SemDeDup never empties a semantic region.
    val byCell = collected.toSeq.groupBy(_._2._1)
    byCell.foreach { case (cell, members) =>
      assert(members.exists(!_._2._3),
        s"cell $cell lost all ${members.size} members")
    }
  }

  test("raising minCos only shrinks the dropped set (pruning is monotone in the threshold)") {
    val loose = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16)
      .filter(col("dropped")).select(col("vec_id"))
    val strict = Similarity.semanticDedup(emb, minCos = 0.6, numCells = 16)
      .filter(col("dropped")).select(col("vec_id"))
    assert(strict.exceptAll(loose).isEmpty,
      "a vector dropped at minCos=0.6 must also drop at 0.2")
  }

  test("plan: corpus-scale stages are aggregates/joins, never a corpus-wide window") {
    val plan = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(!plan.contains("Cartesian"), s"unexpected cartesian product in:\n$plan")
  }
}
