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

  test("cell-skew guard: idle on balanced cells (bit-identical to unguarded), bounded on a collapsed cell") {
    import spark.implicits._
    // balanced corpus: the default cap must change nothing vs guard-off
    val guarded = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16)
      .collect().map(_.toSeq).toSet
    val unguarded = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16,
      maxCellSize = Long.MaxValue).collect().map(_.toSeq).toSet
    assert(guarded === unguarded, "guard engaged on balanced cells")

    // deliberately collapsed cell: 96 identical vectors + 4 distinct seeds
    // (seeds are the first-4 centroid rows). The duplicates all assign to
    // cell 3 (their largest coordinate is index 3 among the seeds), which
    // also holds seed 3 itself → a 97-member degenerate cell, 97² pair
    // work unguarded. With cap=8 it salts into ceil(97/8)=13 sub-cells;
    // per salt group exactly one duplicate survives (identical vectors
    // tie on c_milli, lowest id wins; seed 3 is below the cos threshold
    // against them so it pairs with nothing).
    val dim = 64
    val base = Array.tabulate(dim)(i => 0.001f * ((i % 7) + 1))
    val collapsed = ((0 until 4).map(c =>
      (c.toLong, Array.tabulate(dim)(i => if (i == c) 1.0f else -1.0f))) ++
      (100 until 196).map(id => (id.toLong, base)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(collapsed, minCos = 0.95,
        numCells = 4, maxCellSize = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(out.size === 100, "every vector must appear exactly once")
    // survivors of the duplicate clique = one per sub-cell salt group
    val salts = collapsed.filter(col("vec_id") >= 100)
      .select(pmod(xxhash64(col("vec_id")), lit(13L)).as("s"))
      .as[Long].collect()
    val expectedSurvivors = salts.distinct.length
    val keptDups = (100 until 196).count(id => !out(id.toLong))
    assert(keptDups === expectedSurvivors,
      s"expected one survivor per salt group ($expectedSurvivors), got $keptDups")
    // determinism: a second run is identical
    val again = Similarity.semanticDedup(collapsed, minCos = 0.95,
        numCells = 4, maxCellSize = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(again === out)
  }

  test("skew-guard dispatch: the probed fast path is bit-identical to the " +
    "forced guarded path (r15)") {
    val fast = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16)
      .collect().map(_.toSeq).toSet
    val forced = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16,
      forceGuard = true).collect().map(_.toSeq).toSet
    assert(fast === forced,
      "skipping the salt machinery on an under-cap corpus changed the output")
  }

  test("plan: corpus-scale stages are aggregates/joins, never a corpus-wide window") {
    val plan = Similarity.semanticDedup(emb, minCos = 0.2, numCells = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(!plan.contains("Cartesian"), s"unexpected cartesian product in:\n$plan")
  }

  test("two-level assignment path equals the flat path on separated clusters (r12 dispatch)") {
    // Disjoint 16-coordinate blocks (the LabelQualitySpec fixture family):
    // cross-block dots are exactly 0, so the hierarchy's routing equals
    // the flat argmax and the dropped/cluster columns must be identical.
    val dim = 64
    def v(cluster: Int, jitterIdx: Int): Array[Float] =
      Array.tabulate(dim)(i =>
        if (i / 16 == cluster) 1f + 0.25f * ((i + jitterIdx) % 4) else 0f)
    import spark.implicits._
    val df = (0 until 40).map(i => (i.toLong, v(i % 4, i / 4)))
      .toDF("vec_id", "embedding")
    def rows(tlc: Int) = Similarity.semanticDedup(df, minCos = 0.9,
        numCells = 4, twoLevelCells = tlc)
      .collect().map(_.toSeq).toSet
    assert(rows(1) == rows(Int.MaxValue),
      "two-level semanticDedup diverged from flat on separated clusters")
  }
}
