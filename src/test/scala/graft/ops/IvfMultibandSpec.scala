package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Properties of the scale-path ANN operators: IVF probing and multi-band
  * hyperplane LSH. All scoring is on quantized int64 vectors, so equality
  * assertions are exact. */
class IvfMultibandSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  test("multiband with a single band reproduces the single-plane-set near-dup exactly") {
    val single = Similarity.embeddingNearDup(emb, minCos = 0.2, planes = 12)
      .select(col("id_a"), col("id_b"), col("score"))
    val mb = Similarity.embeddingNearDupMultiband(emb, minCos = 0.2,
      bands = 1, planesPerBand = 12)
      .select(col("id_a"), col("id_b"), col("score"))
    assert(single.exceptAll(mb).isEmpty && mb.exceptAll(single).isEmpty,
      "bands=1 multiband must equal embeddingNearDup with the same planes")
  }

  test("adding bands only grows the near-dup pair set (recall is monotone in bands)") {
    val one = Similarity.embeddingNearDupMultiband(emb, minCos = 0.2,
      bands = 1, planesPerBand = 8).select(col("id_a"), col("id_b"))
    val three = Similarity.embeddingNearDupMultiband(emb, minCos = 0.2,
      bands = 3, planesPerBand = 8).select(col("id_a"), col("id_b"))
    assert(one.exceptAll(three).isEmpty,
      "every band-0 pair must survive when bands 1..2 are added")
    assert(three.count() >= one.count())
    // and no duplicate pairs despite multi-band collisions
    assert(three.distinct().count() == three.count())
  }

  test("ivfTopK scores are exact quantized dot products with well-formed ranks") {
    val res = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), k = 5,
      numCentroids = 8, nprobe = 2).cache()
    // no self matches
    assert(res.filter(col("query_id") === col("vec_id")).count() == 0)
    // ranks are 1..n contiguous per query with scores non-increasing
    val perQuery = res.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"), min(col("rank")).as("minr"))
      .collect()
    perQuery.foreach { r =>
      assert(r.getAs[Long]("n") <= 5 && r.getAs[Int]("minr") == 1 &&
        r.getAs[Int]("maxr") == r.getAs[Long]("n"))
    }
    // every reported score equals the independently recomputed dot product
    val q = emb.select(col("vec_id").as("query_id"),
      Similarity.quantize(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("cv"))
    val mismatches = res.join(q, Seq("query_id")).join(c, Seq("vec_id"))
      .withColumn("expected", Similarity.qdot(col("qv"), col("cv")))
      .filter(col("score") =!= col("expected"))
    assert(mismatches.count() == 0)
  }

  test("kmeansCentroids refines seeds deterministically and plugs into ivfTopKWith") {
    val cent0 = Similarity.kmeansCentroids(emb, k = 4, iterations = 0)
    val cent2a = Similarity.kmeansCentroids(emb, k = 4, iterations = 2)
    val cent2b = Similarity.kmeansCentroids(emb, k = 4, iterations = 2)
    // deterministic across runs
    assert(cent2a.exceptAll(cent2b).isEmpty && cent2b.exceptAll(cent2a).isEmpty)
    // zero iterations = the quantized seeds themselves
    val seeds = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), Similarity.quantize(col("embedding")).as("cv"))
    assert(cent0.exceptAll(seeds).isEmpty && seeds.exceptAll(cent0).isEmpty)
    // refined centroids keep k rows of the right dimensionality and drive
    // a well-formed IVF search
    assert(cent2a.count() == 4)
    assert(cent2a.select(size(col("cv"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(64))
    val res = Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 2), cent2a,
      k = 3, nprobe = 2)
    assert(res.filter(col("query_id") === col("vec_id")).count() == 0)
    assert(res.groupBy(col("query_id")).count().collect().forall(_.getLong(1) <= 3))
  }

  test("trained PQ codebooks: deterministic, zero iterations = seed, recall vs brute force measured") {
    val cb0 = Similarity.pqCodebooks(emb, iterations = 0)
    val cb1a = Similarity.pqCodebooks(emb, iterations = 1)
    val cb1b = Similarity.pqCodebooks(emb, iterations = 1)
    // deterministic across runs; zero iterations reproduces the seeded book
    assert(cb1a.exceptAll(cb1b).isEmpty && cb1b.exceptAll(cb1a).isEmpty)
    val seeded = Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), 10)
    val viaCb0 = Similarity.pqTopKWith(emb, emb.filter(col("vec_id") < 5), cb0, 10, dsub = 16)
    assert(seeded.exceptAll(viaCb0).isEmpty && viaCb0.exceptAll(seeded).isEmpty,
      "iterations=0 codebook must reproduce pqTopK exactly")
    // training actually moves the codebook
    assert(cb1a.exceptAll(cb0).count() > 0, "one Lloyd round must change some entries")

    // Recall@10 against exact brute force, seeded vs trained.
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .select(col("query_id"), col("vec_id"))
      val hit = approx.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_semi").count()
      hit.toDouble / exact.count()
    }
    val rSeed = recall(seeded)
    val rTrained = recall(Similarity.pqTopKTrained(emb, emb.filter(col("vec_id") < 5), 10))
    info(f"PQ recall@10: seeded=$rSeed%.3f trained=$rTrained%.3f")
    // Lloyd fits the codebook to the corpus distribution; at worst it must
    // stay in the same quality band as the arbitrary first-8 seed.
    assert(rTrained >= rSeed - 0.1,
      f"trained recall $rTrained%.3f fell more than 0.1 below seeded $rSeed%.3f")
    assert(rTrained > 0.0)
  }

  test("ivfTopK never returns a worse top-1 than the probed lists contain") {
    // Construct the ground truth restricted to the probed clusters by
    // re-deriving assignment exactly as ivfTopK does, then check top-1.
    val res = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 1), k = 1,
      numCentroids = 8, nprobe = 8) // probe ALL lists → must equal brute force
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 1)
    val ivfTop = res.select(col("vec_id"), col("score")).collect().head
    val bruteTop = brute.select(col("vec_id"), col("score")).collect().head
    assert(ivfTop == bruteTop,
      "probing every list must reduce IVF to exact brute-force top-1")
  }

  test("ivfTwoLevelAssign matches a driver-side reference model exactly") {
    // Re-derive the full hierarchy in plain Scala over collected quantized
    // vectors (tiny sf0.001 corpus) — routing, super argmax, cell argmax,
    // every tie to the lowest id — and demand bit-equality.
    val vecs = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def argmax(cands: Seq[(Long, Array[Long])], v: Array[Long]): Long =
      -cands.map { case (id, cv) => (dot(v, cv), -id) }.max._2
    val cells = Similarity.firstK(emb, 16)
    val supers = cells.take(4)
    val route = cells.map { case (cid, cv) => cid -> argmax(supers, cv) }.toMap
    val expected = vecs.map { case (id, v) =>
      val scid = argmax(supers, v)
      val cellsOfSuper = cells.filter { case (cid, _) => route(cid) == scid }
      id -> argmax(cellsOfSuper, v)
    }.toMap
    val got = Similarity.ivfTwoLevelAssign(emb, cells)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "two-level assignment diverged from the reference model")
  }

  test("ivfTwoLevelAssign shuffles ONCE (cell refinement reuses the super-agg partitioning)") {
    val assign = Similarity.ivfTwoLevelAssign(emb, Similarity.firstK(emb, 16))
    val plan = assign.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly 1 shuffle in two-level assignment, got $exchanges in:\n$plan")
  }

  test("ivfTwoLevelTopK: probing everything at both levels reduces to brute force") {
    val res = Similarity.ivfTwoLevelTopK(emb, emb.filter(col("vec_id") === 1), k = 1,
      numCells = 16, nprobe = 16, sprobe = 4)
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 1)
    val twoTop = res.select(col("vec_id"), col("score")).collect().head
    val bruteTop = brute.select(col("vec_id"), col("score")).collect().head
    assert(twoTop == bruteTop,
      "probing every super-cell and cell must reduce two-level IVF to brute force")
  }
}
