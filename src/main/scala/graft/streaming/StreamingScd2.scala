package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.ops.Incremental
import graft.state.ParquetStateStore

/** Streaming SCD2 maintenance — the incremental flavor of
  * [[graft.ops.Incremental.scd2Intervals]], the natural continuous consumer
  * of the relay's CDC output (the reference's ordered change stream,
  * 02-stored-procedure.postgres.table.sql:43-56): each micro-batch of
  * change rows (key, id, op) maintains the interval table instead of
  * reconstructing it, under the CDC contract that change ids are the
  * total version order (stored-procedure.md:84) and therefore arrive
  * MONOTONE per key across batches.
  *
  * Why the state is NOT the whole interval table: a closed interval
  * `[from, to)` never changes again — only OPEN intervals (one per live
  * key, the "current dimension" table) can be touched by a future batch.
  * So per batch: the batch's own intervals come from the batch-local
  * [[Incremental.scd2Intervals]] window; each committed open interval of a
  * touched key closes at that key's first new id; closed rows APPEND to an
  * idempotent per-batch directory and the open set commits as compact
  * state. Per-batch work is O(batch + live keys), never O(history) — at
  * 100 TB the history lives in append-only parquet, not in a re-written
  * snapshot.
  *
  * Exactly-once across foreachBatch replays — the [[StreamingDedup]]
  * discipline: closed rows write `overwrite` into `closedDir/batch=<id>`
  * (a replayed batch rewrites its own directory identically, because the
  * state it reads is unchanged until the commit), and `committed_batch`
  * rides IN the open-state snapshot so state and progress flip in ONE
  * atomic pointer commit; a batch at-or-below `committed_batch`
  * short-circuits.
  *
  * Contract (spec-pinned): [[intervals]] — the closed dirs plus the open
  * state — equals the one-shot [[Incremental.scd2Intervals]] over the
  * concatenation of every batch, including the tri-state delete
  * discipline (a delete's tombstone interval stays, `is_current` false). */
object StreamingScd2 {

  private val OpenTable = "scd2_open"
  private val openSchema = new StructType()
    .add("k", StringType).add("valid_from", LongType).add("op", StringType)
    .add("committed_batch", LongType)

  /** The live-version table: one open interval per non-deleted key, plus
    * current tombstones (op = D) so "deleted" ≠ "never existed". */
  def openIntervals(store: ParquetStateStore): DataFrame =
    store.read(OpenTable, openSchema).select(col("k"), col("valid_from"), col("op"))

  private def committedBatch(store: ParquetStateStore): Long =
    store.read(OpenTable, openSchema)
      .agg(coalesce(max(col("committed_batch")), lit(-1L)))
      .collect()(0).getLong(0)

  /** Apply one micro-batch (columns `k`, `id`, `op`); exposed for direct
    * reuse and the spec's batch-fold oracle. Returns rows closed. */
  def applyBatch(store: ParquetStateStore, batch: DataFrame, batchId: Long,
                 closedDir: String): Long = {
    if (batchId <= committedBatch(store)) return 0L // replay of a landed batch
    // The batch feeds the interval window AND the first-new-id rollup —
    // materialize once (round-4 rule d; micro-batch-sized rows).
    val b = batch.select(col("k").cast("string").as("k"),
      col("id").cast("long").as("id"), col("op").cast("string").as("op"))
      .localCheckpoint()
    val iv = Incremental.scd2Intervals(b, "k", "id", "op")
      .select(col("k"), col("valid_from"), col("valid_to"), col("op"),
        col("is_current"))
    val firstNew = b.groupBy(col("k")).agg(min(col("id")).as("_fn"))
    val open = openIntervals(store)
    // Committed open intervals of touched keys close at the key's first
    // new id — exactly what the one-shot lead() would have produced.
    val closedFromState = open.join(firstNew, Seq("k"))
      .select(col("k"), col("valid_from"), col("_fn").as("valid_to"),
        col("op"), lit(false).as("is_current"))
    val stillOpen = open.join(firstNew, Seq("k"), "left_anti")
    val newClosed = closedFromState
      .unionByName(iv.filter(col("valid_to").isNotNull)
        .select(col("k"), col("valid_from"), col("valid_to"), col("op"),
          lit(false).as("is_current")))
      .localCheckpoint() // written AND counted; one evaluation
    // Idempotent per-batch output first, atomic state commit second.
    newClosed.write.mode(SaveMode.Overwrite).parquet(s"$closedDir/batch=$batchId")
    val newOpen = iv.filter(col("valid_to").isNull)
      .select(col("k"), col("valid_from"), col("op"))
    store.commit(OpenTable,
      stillOpen.unionByName(newOpen).withColumn("committed_batch", lit(batchId)))
    newClosed.count()
  }

  /** The full maintained interval table — closed history (append-only
    * parquet) plus the open set, shaped exactly like the one-shot
    * [[Incremental.scd2Intervals]] output projected to
    * (k, valid_from, valid_to, op, is_current). */
  def intervals(spark: SparkSession, store: ParquetStateStore,
                closedDir: String): DataFrame = {
    val cols = Seq(col("k"), col("valid_from"), col("valid_to"), col("op"),
      col("is_current"))
    val closed =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(closedDir)))
        spark.read.parquet(closedDir).select(cols: _*)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new StructType().add("k", StringType).add("valid_from", LongType)
          .add("valid_to", LongType).add("op", StringType)
          .add("is_current", org.apache.spark.sql.types.BooleanType))
    closed.unionByName(openIntervals(store)
      .select(col("k"), col("valid_from"), lit(null).cast("long").as("valid_to"),
        col("op"), (col("op") =!= "D").as("is_current")))
  }

  /** Start the continuous maintenance: `stream` must carry `k`, `id`, `op`.
    * One query per state store — application is ordered by micro-batch. */
  def start(spark: SparkSession, stream: DataFrame, store: ParquetStateStore,
            closedDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .queryName(s"graft-scd2-${closedDir.hashCode.toHexString}")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(store, batch, batchId, closedDir)
        ()
      }
      .start()
}
