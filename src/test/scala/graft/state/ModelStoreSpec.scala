package graft.state

import graft.{SparkSpec, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Persisted ANN model artifacts: save/load must round-trip bit-exactly
  * (a drifted centroid silently degrades every subsequent ranking), serving
  * from the reloaded artifact must equal serving from the in-memory one,
  * and commits must be snapshot-versioned like every other store. */
class ModelStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)
  private def freshStore() =
    new ModelStore(spark, Files.createTempDirectory("graft-model-spec").toString)

  test("IVF centroids round-trip bit-exactly and serve identically to in-memory") {
    val store = freshStore()
    val trained = store.trainIvf("m", emb, k = 4, iterations = 1)
    val loaded = store.loadCentroids("m")
    assert(loaded.map { case (id, v) => (id, v.toSeq) } ==
      trained.map { case (id, v) => (id, v.toSeq) })
    val q = emb.filter(col("vec_id") < 3)
    def rows(cent: IndexedSeq[(Long, Array[Long])]) =
      Similarity.ivfTopKArrays(emb, q, cent, 5, nprobe = 2)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(rows(loaded) == rows(trained),
      "persisted-then-reloaded centroids must rank exactly like the trained ones")
  }

  test("PQ codebook round-trips including subspace and element order") {
    val store = freshStore()
    val cb = store.trainPq("p", emb, m = 4, ksub = 8, dim = 64, iterations = 1)
    val loaded = store.loadCodebook("p")
    def flat(c: Similarity.PqCodebook) = c.map { case (id, subs) => (id, subs.map(_.toSeq)) }
    assert(flat(loaded) == flat(cb))
  }

  test("retraining commits a new snapshot; readers always see a complete model") {
    val store = freshStore()
    store.saveCentroids("m", IndexedSeq((0L, Array(1L, 2L))))
    val c0 = store.commitCount
    store.saveCentroids("m", IndexedSeq((0L, Array(3L, 4L)), (1L, Array(5L, 6L))))
    assert(store.commitCount == c0 + 1)
    assert(store.loadCentroids("m").map { case (id, v) => (id, v.toSeq) } ==
      IndexedSeq((0L, Seq(3L, 4L)), (1L, Seq(5L, 6L))))
  }

  test("loading a never-trained model yields empty, not an error") {
    assert(freshStore().loadCentroids("nope").isEmpty)
    assert(freshStore().loadCodebook("nope").isEmpty)
  }
}
