package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.functions._

/** Pins the small-corpus fused fast path of the ANN/embedding operators:
  * value-identical to the exploded scale path, and the strategy flip itself
  * (a corpus over the cap takes the Generate-shaped pipeline; a corpus
  * under it takes the map-side literal-expression plan) — the same
  * auto-selection contract llm_decontam_hash pins for decontaminate. */
class AnnSmallPathSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  // Multiset, not Set: a lost distinct() on candidate pairs would leave
  // values equal but multiplicities different — a Set compare would hide it.
  private def rows(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  private def hasGenerate(df: DataFrame): Boolean = {
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its inner
    // plan from .children until execution.
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(walk)
    walk(df.queryExecution.sparkPlan).exists(_.isInstanceOf[GenerateExec])
  }

  test("embeddingNearDup: fused path equals the exploded path bit for bit") {
    val small = Similarity.embeddingNearDup(emb, minCos = 0.2)
    val large = Similarity.embeddingNearDup(emb, minCos = 0.2, smallCap = 0)
    assert(rows(small) == rows(large))
  }

  test("embeddingNearDupMultiband: fused path equals the exploded path") {
    val small = Similarity.embeddingNearDupMultiband(emb, minCos = 0.2)
    val large = Similarity.embeddingNearDupMultiband(emb, minCos = 0.2, smallCap = 0)
    assert(rows(small) == rows(large))
  }

  test("pqTopK: fused path equals the join path") {
    val q = emb.filter(col("vec_id") < 5)
    assert(rows(Similarity.pqTopK(emb, q, 10)) ==
      rows(Similarity.pqTopK(emb, q, 10, smallCap = 0)))
  }

  test("pqTopKTrained: fused path equals the join path after one Lloyd round") {
    val q = emb.filter(col("vec_id") < 5)
    assert(rows(Similarity.pqTopKTrained(emb, q, 10)) ==
      rows(Similarity.pqTopKTrained(emb, q, 10, smallCap = 0)))
  }

  test("ivfTopKArrays: literal-argmax path equals the broadcast-aggregate path") {
    val q = emb.filter(col("vec_id") < 3)
    val cent = Similarity.firstK(emb, 8)
    assert(rows(Similarity.ivfTopKArrays(emb, q, cent, 5, nprobe = 2)) ==
      rows(Similarity.ivfTopKArrays(emb, q, cent, 5, nprobe = 2, smallCap = 0)))
  }

  test("k-means training: expression-argmax branch equals the crossJoin+max_by branch") {
    val small = Similarity.kmeansCentroidArrays(emb, k = 4, iterations = 2)
    val large = Similarity.kmeansCentroidArrays(emb, k = 4, iterations = 2, smallCap = 0)
    assert(small.map { case (id, v) => (id, v.toSeq) } ==
      large.map { case (id, v) => (id, v.toSeq) })
  }

  test("PQ training: expression-encode branch equals the element-join branch") {
    val small = Similarity.pqCodebookArrays(emb, iterations = 1)
    val large = Similarity.pqCodebookArrays(emb, iterations = 1, smallCap = 0)
    def flat(cb: Similarity.PqCodebook) =
      cb.map { case (id, subs) => (id, subs.map(_.toSeq)) }
    assert(flat(small) == flat(large))
  }

  test("mmrSelect: driver-greedy fused path equals the k-round distributed path") {
    val small = Similarity.mmrSelect(emb, "vec_id", "embedding", probeId = 0L, k = 5)
    val large = Similarity.mmrSelect(emb, "vec_id", "embedding", probeId = 0L, k = 5,
      smallCap = 0)
    assert(rows(small) == rows(large))
  }

  test("mmrSelect: missing probe rejects clearly; fewer than k candidates returns the partial selection") {
    // absent probe id must be a clear contract error on BOTH paths, not a
    // NoSuchElementException from a driver-side .get/.head()
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(emb, "vec_id", "embedding", probeId = -99L, k = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(emb, "vec_id", "embedding", probeId = -99L, k = 3,
        smallCap = 0)
    }
    // 4 candidates, k=10: the greedy loop must terminate with 4 ranks on
    // both paths (previously maxBy/getStruct on empty data hung or threw)
    val tiny = emb.filter(col("vec_id") < 5)
    val small = Similarity.mmrSelect(tiny, "vec_id", "embedding", probeId = 0L, k = 10)
    val large = Similarity.mmrSelect(tiny, "vec_id", "embedding", probeId = 0L, k = 10,
      smallCap = 0)
    assert(small.count() === 4L && rows(small) == rows(large))
  }

  test("ANN top-k is the bounded topk_pairs aggregate, not a rank window") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    import graft.expressions.{TopKPairs, TopKPairsTagged}
    val q = emb.filter(col("vec_id") < 3)
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(walk)
    def partialTopK(df: DataFrame): Boolean =
      walk(df.queryExecution.sparkPlan).exists {
        case o: ObjectHashAggregateExec => o.aggregateExpressions.exists(ae =>
          ae.mode == Partial && (ae.aggregateFunction.isInstanceOf[TopKPairs] ||
            ae.aggregateFunction.isInstanceOf[TopKPairsTagged]))
        case _ => false
      }
    def hasWindow(df: DataFrame): Boolean =
      walk(df.queryExecution.sparkPlan).exists(_.isInstanceOf[WindowExec])
    // Candidate-side top-k must partial-aggregate map-side (bounded shuffle:
    // k pairs per partition per query, never all candidates into one window
    // task) in BOTH execution tiers of every ANN path.
    val noWindowAtAll = Seq(
      "brute" -> Similarity.bruteForceTopK(emb, q, 5),
      "lsh" -> Similarity.lshTopK(emb, q, 5),
      "pq_fused" -> Similarity.pqTopK(emb, q, 5),
      "pq_join" -> Similarity.pqTopK(emb, q, 5, smallCap = 0))
    for ((name, df) <- noWindowAtAll) {
      assert(partialTopK(df), s"$name: expected a partial topk_pairs aggregate")
      assert(!hasWindow(df), s"$name: the rank window must be gone")
    }
    // IVF keeps a window on the PROBE side only (≤K centroid rows per query
    // — bounded by construction); the corpus-scale candidate top-k is the
    // tagged bounded aggregate.
    val ivf = Seq(
      "ivf_fused" -> Similarity.ivfTopKArrays(emb, q, Similarity.firstK(emb, 4), 5),
      "ivf_join" -> Similarity.ivfTopKArrays(emb, q, Similarity.firstK(emb, 4), 5, smallCap = 0))
    for ((name, df) <- ivf)
      assert(partialTopK(df), s"$name: expected a partial topk_pairs_tag aggregate")
  }

  test("strategy flip: under the cap the plan is map-shaped, over it the pipeline engages") {
    val fused = Similarity.embeddingNearDup(emb, minCos = 0.2)
    assert(!hasGenerate(fused),
      "small corpus must take the literal-expression plan (no explode)")
    val exploded = Similarity.embeddingNearDup(emb, minCos = 0.2, smallCap = 0)
    assert(hasGenerate(exploded),
      "over-cap corpus must take the exploded codegen pipeline")
    // The probe is verifiable row-count, not a guess: a cap below the
    // corpus row count must refuse the fast path.
    assert(!Similarity.fitsSmallCorpus(emb, cap = 3))
    assert(Similarity.fitsSmallCorpus(emb, cap = 1000000))
  }

  test("native qdot_q/qdist2_q reproduce the HOF forms bit-for-bit, " +
    "including the null contract (either-null, unequal-length, null-element)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fix = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, -5L, 6L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](4L, 5L, 6L)), // ragged
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)), // null el
      (4L, null, Seq[java.lang.Long](1L, 2L, 3L)), // null side
      (5L, Seq[java.lang.Long](-7L, 0L, 9L), Seq[java.lang.Long](2L, 8L, -3L))
    ).toDF("id", "a", "b")
    val got = fix.select(col("id"),
      Similarity.qdot(col("a"), col("b")).as("nd"),
      Similarity.qdotHof(col("a"), col("b")).as("hd"),
      Similarity.qdist2(col("a"), col("b")).as("n2"),
      Similarity.qdist2Hof(col("a"), col("b")).as("h2"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
    got.foreach { case (id, nd, hd, n2, h2) =>
      assert(nd == hd, s"id=$id qdot native=$nd hof=$hd")
      assert(n2 == h2, s"id=$id qdist2 native=$n2 hof=$h2")
    }
    assert(got.find(_._1 == 1L).get._2 == 12L) // 4 - 10 + 18
    assert(got.filter(r => Seq(2L, 3L, 4L).contains(r._1)).forall(_._2 == null))
    // and on real corpus vectors the two forms agree everywhere
    val both = emb.limit(50).select(Similarity.quantize(col("embedding")).as("v"))
      .crossJoin(emb.limit(7).select(Similarity.quantize(col("embedding")).as("w")))
    assert(both.filter(
      Similarity.qdot(col("v"), col("w")) =!= Similarity.qdotHof(col("v"), col("w")) ||
      Similarity.qdist2(col("v"), col("w")) =!= Similarity.qdist2Hof(col("v"), col("w"))
    ).count() == 0)
  }

  test("native kernels == HOF forms on randomized adversarial arrays " +
    "(ragged lengths, null elements, null sides, extreme values)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    def arr(): Seq[java.lang.Long] =
      if (rnd.nextInt(20) == 0) null
      else Seq.fill(rnd.nextInt(9))(
        if (rnd.nextInt(15) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong() % 1000000L))
    val fix = (1 to 300).map(i => (i.toLong, arr(), arr()))
      .toDF("id", "a", "b")
    val diverged = fix.select(
      Similarity.qdot(col("a"), col("b")).as("nd"),
      Similarity.qdotHof(col("a"), col("b")).as("hd"),
      Similarity.qdist2(col("a"), col("b")).as("n2"),
      Similarity.qdist2Hof(col("a"), col("b")).as("h2"))
      .filter(!(col("nd") <=> col("hd")) || !(col("n2") <=> col("h2")))
      .count()
    assert(diverged == 0, s"$diverged random rows diverged between native and HOF")
  }
}
