package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The lineage-cut primitive behind every checkpoint site (r19; makes the
  * [[DedupOps]] one-place cluster-scale statement EXECUTABLE instead of
  * advisory). Mode comes from the session conf `spark.graft.checkpointMode`:
  *
  *  - `local` (default): `localCheckpoint` — deserialized executor-local
  *    blocks; free and correct single-JVM, lost on executor death;
  *  - `reliable`: `checkpoint()` against `sparkContext.setCheckpointDir`
  *    (HDFS/S3-backed — survives executor loss; costs a write + read);
  *  - `persist`: `persist(MEMORY_AND_DISK)` + a count() barrier — keeps
  *    lineage for fault recovery, re-runs the cut subtree on loss; only
  *    sound for the PLAN-shaping uses (duplicate-subtree prevention, AQE
  *    skew-split enablement), NOT for sites that need the non-determinism
  *    fence of a true checkpoint.
  *
  * CheckpointSwapSpec pins that `reliable` is a drop-in swap (identical
  * operator output) — the claim the r18 verdict asked to be tested rather
  * than documented. */
object Lineage {
  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get("spark.graft.checkpointMode", "local")

  /** Eager lineage cut (the `localCheckpoint()` default). */
  def cut(df: DataFrame): DataFrame = mode(df) match {
    case "reliable" => df.checkpoint()
    case "persist" =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    case _ => df.localCheckpoint()
  }

  /** Lazy lineage cut (`eager = false` sites — materialized on first use). */
  def cutLazy(df: DataFrame): DataFrame = mode(df) match {
    case "reliable" => df.checkpoint(eager = false)
    case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
    case _ => df.localCheckpoint(eager = false)
  }
}
