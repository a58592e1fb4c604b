package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Integer-exact principal-component extraction over an embedding column:
  * quantize, aggregate the dim² Gram matrix with the native
  * [[graft.expressions.GramMatrix]] aggregate, then run a fixed number of
  * power-iteration rounds on the driver-held matrix. The dominant
  * eigenvector is the direction a curation pipeline watches for embedding
  * collapse (one direction swallowing the space) and is the first step of
  * any PCA-whitening / low-rank-projection stage.
  *
  * Scale shape — the MLlib covariance shape (round-7 rule e): the corpus
  * appears in exactly ONE aggregation job whose shuffled state is a single
  * dim² long array per partition (map-side partial, see GramMatrix);
  * everything after is driver compute on a 64×64 integer matrix — k×dim²
  * bounded, never corpus-scale, zero extra jobs regardless of N.
  *
  * Integer-exact and oracle-replayable: quantization is
  * `floor(x · quantScale)` (floor, not cast — DuckDB rounds, Spark
  * truncates), the Gram is normalized by N with truncating division, and
  * each round rescales `v ← (G·v) / max(1, max|G·v| / 10⁶)` in pure Long
  * arithmetic (Scala `/` and DuckDB `//` both truncate toward zero —
  * verified round-9). The DuckDB oracle replays the identical rounds as
  * chained MATERIALIZED CTEs. Overflow audit at quantScale=1000 over
  * unit-norm-ish embeddings: |q| ≤ ~600 ⇒ normalized Gram entries
  * ≤ 3.6·10⁵, |v| ≤ 2·10⁶ ⇒ |G·v| ≤ dim · 7.2·10¹¹ ≈ 4.6·10¹³ — four
  * orders inside int64 at any corpus size.
  */
object Pca {

  /** Rescale target for the iterated vector (components stay ~10⁶). */
  val VScale = 1000000L

  /** The quantization projection shared by every spectral op (and
    * replayed verbatim by the oracles): `floor(x · quantScale)` per
    * element, as BIGINT. */
  def quantizeExpr(embCol: String, quantScale: Long): String =
    s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * $quantScale) AS BIGINT))"

  /** Dominant eigenvector of the N-normalized Gram matrix after `rounds`
    * integer power-iteration rounds, as a driver-held dim-length array —
    * the bounded model state (like Lloyd centroids) the distributed
    * passes broadcast back. Returns None on an empty (or all-ragged)
    * corpus — there is no spectrum to report, and the registry queries
    * must emit ZERO rows to stay oracle-identical.
    *
    * Ragged vectors AND vectors containing a NULL element are filtered
    * out HERE, not just inside the aggregate: `n` (the Gram normalizer),
    * the spectralHistogram projection pass, and the oracle's
    * `WHERE len(embedding) = dim AND <no null element>` must all see the
    * SAME row set — GramMatrix skips null-element rows in-aggregate (as a
    * backstop), so counting such a row in `n` would silently dilute the
    * normalized Gram (round-11 advice). A `zip_with` over a short/nully
    * vector would likewise poison the dot product with NULLs (they're
    * counted by ann_integrity, never silently summed). */
  def dominantEigenvector(emb: DataFrame, embCol: String, dim: Int,
                          quantScale: Long = 1000L, rounds: Int = 5): Option[Array[Long]] = {
    val q = wellFormed(emb, embCol, dim)
      .select(expr(quantizeExpr(embCol, quantScale)).as("q"))
    // ONE row: a dim² array + a count — matrix-scale, never corpus-scale.
    val row = q.agg(expr(s"gram_matrix(q, $dim)").as("g"), count(lit(1)).as("n")).head()
    val g = row.getSeq[Long](0).toArray
    val n = row.getLong(1)
    if (n == 0L) return None
    val gn = g.map(_ / n)
    var v = Array.fill(dim)(VScale)
    var r = 0
    while (r < rounds) {
      val w = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        var s = 0L
        var j = 0
        val base = i * dim
        while (j < dim) { s += gn(base + j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var m = 0L
      i = 0
      while (i < dim) { val a = math.abs(w(i)); if (a > m) m = a; i += 1 }
      val d = math.max(1L, m / VScale)
      v = w.map(_ / d)
      r += 1
    }
    Some(v)
  }

  private def wellFormed(emb: DataFrame, embCol: String, dim: Int): DataFrame =
    emb.filter(size(col(embCol)) === dim && forall(col(embCol), _.isNotNull))

  /** [[dominantEigenvector]] as (dim_idx, component) rows — the
    * registry/oracle surface. Empty corpus → empty result (oracle
    * parity: the DuckDB CTE chain yields zero rows too). */
  def powerIteration(emb: DataFrame, embCol: String, dim: Int,
                     quantScale: Long = 1000L, rounds: Int = 5): DataFrame = {
    val v = dominantEigenvector(emb, embCol, dim, quantScale, rounds)
      .map(_.toSeq).getOrElse(Seq.empty)
    import scala.jdk.CollectionConverters._
    emb.sparkSession.createDataFrame(
      v.zipWithIndex
        .map { case (c, i) => Row(i, c) }.asJava,
      StructType(Seq(
        StructField("dim_idx", IntegerType, nullable = false),
        StructField("component", LongType, nullable = false))))
  }

  /** Histogram of corpus projections onto the dominant eigenvector — the
    * embedding-collapse detector: a healthy space spreads its mass across
    * many projection buckets; a collapsed one (one direction swallowing
    * the geometry) piles into few. Two corpus passes total: the Gram
    * aggregation inside [[dominantEigenvector]], then ONE map-only
    * projection pass with the dim-length eigenvector broadcast as a
    * literal array (`zip_with` dot product + truncating-div bucket),
    * collapsing into a bucket-bounded aggregation. The per-row HOF cost
    * is dim interpreted lambda evals (~1 µs each, round-9 rule a) —
    * acceptable here; a native dot-product Expression is the upgrade
    * path if a profile ever shows this pass hot. */
  def spectralHistogram(emb: DataFrame, embCol: String, dim: Int,
                        quantScale: Long = 1000L, rounds: Int = 5,
                        bucketWidth: Long = 1L << 30): DataFrame = {
    val v = dominantEigenvector(emb, embCol, dim, quantScale, rounds)
      .getOrElse(new Array[Long](dim)) // no well-formed rows → no buckets below anyway
    val vLit = array(v.map(lit(_)).toIndexedSeq: _*)
    wellFormed(emb, embCol, dim)
      .select(expr(quantizeExpr(embCol, quantScale)).as("q"))
      .select(aggregate(zip_with(col("q"), vLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("proj"))
      .groupBy(expr(s"proj div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("proj")).as("min_proj"),
        max(col("proj")).as("max_proj"))
  }
}
