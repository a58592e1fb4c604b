package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructType}
import graft.ops.{DedupOps, TextOps}
import graft.state.ParquetStateStore

/** Incremental corpus accounting over a document stream: per-source exact
  * doc/token counts plus a KMV bottom-k sketch of distinct CONTENT (hash of
  * the normalized text), merged batch-over-batch — the always-current
  * dataset card a 100 TB ingest needs without ever rescanning prior
  * batches.
  *
  * Why a sketch merge is the right state: KMV bottom-k is LOSSLESSLY
  * mergeable — the bottom-k of a union is computable from the two bottom-k
  * sets alone (`slice(array_sort(array_union(a, b)), 1, k)`), so
  * maintaining the sketch incrementally yields the BIT-IDENTICAL sketch a
  * full-corpus pass would produce (StreamingStatsSpec pins this equality).
  * Distinct-content vs exact doc count gives the per-source duplication
  * factor, live.
  *
  * Exactly-once across foreachBatch replays: state rows carry
  * `committed_batch` in the SAME snapshot table (one atomic pointer flip —
  * round-6 rule d/f), and a batch at-or-below it short-circuits. Counts are
  * additive, so replay without the guard would double-count; the guard is
  * load-bearing, not hygiene.
  *
  * Scale: per batch ONE (source)-keyed aggregation with k-bounded sketch
  * state and map-side partials; the state table is sources × (k+3) values,
  * never corpus rows. */
object StreamingStats {

  private val StatsTable = "corpus_stats"
  val HashSpace: Long = graft.ops.Sketches.HashSpaceLong // single definition

  private val statsSchema = new StructType()
    .add("source", StringType)
    .add("docs", LongType).add("tokens", LongType)
    .add("mins", ArrayType(LongType, containsNull = false))
    .add("committed_batch", LongType)

  def readState(store: ParquetStateStore): DataFrame =
    store.read(StatsTable, statsSchema)

  private def committedBatch(store: ParquetStateStore): Long =
    readState(store).agg(coalesce(max(col("committed_batch")), lit(-1L)))
      .head().getLong(0)

  /** One (source)-keyed aggregation over a static batch. The normalized
    * text is materialized ONCE through a Generate barrier before the token
    * count and the content hash consume it — CollapseProject would
    * otherwise inline the two-regex normalize chain into BOTH consumers
    * (round-4 perf trap; measured 43.2→30.3 s at 1M docs). */
  def batchStats(batch: DataFrame, srcCol: String, textCol: String,
                 k: Int): DataFrame =
    // coalesce: a null text row would otherwise count -1 tokens
    // (size(split(null)) = -1 under legacy sizeOfNull) and skip the KMV
    // probe while still counting as a doc — review catch
    batch.select(col(srcCol).as("source"),
        explode(array(TextOps.normalize(coalesce(col(textCol), lit(""))))).as("_norm"))
      .select(col("source"),
        when(length(col("_norm")) === 0, 0L)
          .otherwise(size(TextOps.tokens(col("_norm"))).cast("long")).as("_nt"),
        DedupOps.hash60(col("_norm")).as("_h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("_nt")).as("tokens"),
        expr(s"kmv_mins(_h, $k)").as("mins"))

  /** Merge one micro-batch into the state; exposed for direct reuse and the
    * spec's replay checks. Returns the number of state rows after merge. */
  def mergeBatch(store: ParquetStateStore, batch: DataFrame, batchId: Long,
                 srcCol: String = "source", textCol: String = "text",
                 k: Int = 256): Long = {
    if (batchId <= committedBatch(store)) return readState(store).count()
    val fresh = batchStats(batch, srcCol, textCol, k)
    val prev = readState(store).select(col("source"),
      col("docs").as("_pd"), col("tokens").as("_pt"), col("mins").as("_pm"))
    val merged = fresh.join(prev, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("docs"), lit(0L)) + coalesce(col("_pd"), lit(0L))).as("docs"),
        (coalesce(col("tokens"), lit(0L)) + coalesce(col("_pt"), lit(0L))).as("tokens"),
        slice(array_sort(array_union(
          coalesce(col("mins"), array().cast(ArrayType(LongType, containsNull = false))),
          coalesce(col("_pm"), array().cast(ArrayType(LongType, containsNull = false))))),
          1, k).as("mins"))
      .withColumn("committed_batch", lit(batchId))
    store.commit(StatsTable, merged)
    readState(store).count()
  }

  /** Live dataset-card readout: exact docs/tokens plus the KMV
    * distinct-content estimate and the resulting duplication factor.
    * A sketch with fewer than k values IS the exact distinct set (size);
    * a saturated sketch uses the standard (k-1)·H/max(mins) estimator,
    * computed division-first — (k-1)·H overflows int64 at the default
    * k=256 (255·2^60 > 2^63), H div (max div (k-1)) stays in range, and
    * the inner div is floored at 1 (a k-th minimum below k-1 is not
    * reachable with a 60-bit hash in practice, but a zero divisor must
    * be impossible by construction, not by luck). */
  def snapshot(store: ParquetStateStore, k: Int = 256): DataFrame =
    readState(store).select(col("source"), col("docs"), col("tokens"),
        graft.ops.Sketches.kmvEstimate("mins", k).as("est_distinct"))
      .withColumn("dup_factor_ppm",
        expr("docs * 1000000 div greatest(est_distinct, 1)"))

  /** Start the continuous accounting query. */
  def start(spark: SparkSession, stream: DataFrame, store: ParquetStateStore,
            checkpointDir: String, srcCol: String = "source",
            textCol: String = "text", k: Int = 256): StreamingQuery =
    stream.writeStream
      .queryName(s"graft-stats-${checkpointDir.hashCode.toHexString}")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(store, batch, batchId, srcCol, textCol, k)
        ()
      }
      .start()
}
