package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.ops.Similarity

/** Trained ANN model artifacts — IVF centroids and PQ codebooks — as
  * first-class persisted state: [[ParquetStateStore]]-style versioned
  * parquet snapshots behind an atomic pointer commit.
  *
  * This is the deployment shape that decouples training from serving:
  * train once (the corpus-scale Lloyd job), commit the k×dim artifact,
  * and every subsequent query ranks against the RELOADED centroids —
  * no `firstK` corpus scan, no re-training, per query. At 100 TB
  * re-deriving centroids per query would re-scan the corpus to fetch a
  * few kilobytes of state; here serving reads exactly those kilobytes.
  * Crash safety is the store's: a training job that dies mid-write never
  * corrupts the served model (readers resolve the previous pointer).
  */
final class ModelStore(spark: SparkSession, rootDir: String) {

  private val store = new ParquetStateStore(spark, rootDir)

  /** Snapshot commits performed through this store (spec observability). */
  def commitCount: Long = store.commitCount

  private val centroidSchema = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cv", ArrayType(LongType, containsNull = false), nullable = false)))

  private val codebookSchema = StructType(Seq(
    StructField("code_id", LongType, nullable = false),
    StructField("s", LongType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("cq", LongType, nullable = false)))

  // ---- IVF centroids -----------------------------------------------------

  def saveCentroids(name: String, cent: Seq[(Long, Array[Long])]): Unit = {
    import spark.implicits._
    store.commit(s"centroids_$name", cent.map { case (id, v) => (id, v.toSeq) }
      .toDF("cid", "cv"))
  }

  /** Driver-array form for [[Similarity.ivfTopKArrays]] — sorted by cid,
    * the same id-order contract as `firstK`/`kmeansCentroidArrays`. The
    * collect is k×dim-bounded (centroid-scale, never corpus-scale). */
  def loadCentroids(name: String): IndexedSeq[(Long, Array[Long])] =
    store.read(s"centroids_$name", centroidSchema)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toIndexedSeq

  /** Table form for [[Similarity.ivfTopKWith]] consumers. */
  def centroidTable(name: String): DataFrame =
    store.read(s"centroids_$name", centroidSchema)

  /** Train-then-commit in one call: the corpus-scale Lloyd job runs once,
    * the artifact commits atomically, and the trained arrays return for
    * immediate serving. */
  def trainIvf(name: String, corpus: DataFrame, k: Int,
               iterations: Int = 2): IndexedSeq[(Long, Array[Long])] = {
    val cent = Similarity.kmeansCentroidArrays(corpus, k, iterations)
    saveCentroids(name, cent)
    cent
  }

  // ---- PQ codebooks ------------------------------------------------------

  def saveCodebook(name: String, cb: Similarity.PqCodebook): Unit = {
    import spark.implicits._
    val rows = cb.flatMap { case (codeId, subs) =>
      subs.zipWithIndex.flatMap { case (arr, s) =>
        arr.zipWithIndex.map { case (cq, j) => (codeId, s.toLong, j, cq) }
      }
    }
    store.commit(s"codebook_$name", rows.toDF("code_id", "s", "j", "cq"))
  }

  /** Reconstructed in id-sorted order — the [[Similarity.PqCodebook]]
    * contract (argmin ties to the lowest index == lowest code id). */
  def loadCodebook(name: String): Similarity.PqCodebook = {
    val rows = store.read(s"codebook_$name", codebookSchema).collect()
    rows.groupBy(_.getLong(0)).toIndexedSeq.sortBy(_._1).map { case (codeId, rs) =>
      val bySub = rs.groupBy(_.getLong(1)).toIndexedSeq.sortBy(_._1).map { case (_, srs) =>
        srs.sortBy(_.getInt(2)).map(_.getLong(3)).toArray
      }
      (codeId, bySub)
    }
  }

  def trainPq(name: String, corpus: DataFrame, m: Int = 4, ksub: Int = 8,
              dim: Int = 64, iterations: Int = 1): Similarity.PqCodebook = {
    val cb = Similarity.pqCodebookArrays(corpus, m, ksub, dim, iterations)
    saveCodebook(name, cb)
    cb
  }
}
