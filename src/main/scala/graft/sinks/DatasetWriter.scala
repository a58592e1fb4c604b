package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Assemble
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Sharded training-dataset writer: materializes a shard-planned corpus
  * ([[Assemble.shardPlan]] output) as a parquet dataset partitioned by
  * shard, with an audited manifest and an atomic publish protocol.
  *
  * Publish protocol (same pointer discipline as
  * [[graft.state.ParquetStateStore]]):
  *
  *   1. data writes to a fresh versioned dir, `partitionBy(shard_id)` —
  *      each shard is its own file group, the unit a trainer streams;
  *   2. the manifest is RECOMPUTED from the bytes read back off those
  *      files and compared (distributed anti-join, never collected) to
  *      the manifest of the planned input — a lost or duplicated row
  *      between plan and disk fails the publish here;
  *   3. the audited manifest writes next to the data;
  *   4. a `_CURRENT` pointer flips via write-temp + ATOMIC_MOVE — the
  *      commit. A crash at/before step 4 leaves the previous version
  *      live and the orphan staging dir is GC'd by the next publish.
  *
  * Readers resolve the pointer, so training jobs never observe a
  * half-written dataset; re-publishing after a crash is idempotent at
  * the dataset level (a new version, same content, same manifest). */
final class DatasetWriter(spark: SparkSession, rootDir: String) {

  private val root: Path = Paths.get(rootDir)
  private def pointer: Path = root.resolve("_CURRENT")

  /** Columns the manifest audit needs in the written data. */
  val ShardCol = "shard_id"

  final case class Publish(version: String, nShards: Long, nDocs: Long)

  /** True iff the two manifests hold identical row sets — both are
    * shard-scale, compared distributed (symmetric anti-join). */
  private[sinks] def manifestsAgree(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def currentVersion: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim).filter(_.nonEmpty)
    else None

  /** The live dataset (data files of the current version), or None before
    * the first successful publish. */
  def currentDataDir: Option[String] =
    currentVersion.map(v => root.resolve(v).resolve("data").toString)
      .filter(d => Files.exists(Paths.get(d)))

  def readCurrent(): Option[DataFrame] =
    currentDataDir.map(spark.read.parquet(_))

  def readManifest(): Option[DataFrame] =
    currentVersion.map(v => root.resolve(v).resolve("manifest").toString)
      .filter(d => Files.exists(Paths.get(d)))
      .map(spark.read.parquet(_))

  /** Publish a planned dataset. `planned` must carry `shard_id`, `idCol`,
    * `tokensCol` and `csumCol` (the per-row [[Assemble.contentChecksumTerm]]
    * value, persisted with the data so any later reader can re-audit the
    * bytes it actually got). Throws (and leaves the previous version live)
    * if the read-back audit finds the written bytes differ from the plan. */
  def publish(planned: DataFrame, idCol: String, tokensCol: String,
              csumCol: String): Publish = {
    Files.createDirectories(root)
    val version = s"v${System.nanoTime()}"
    val stage = root.resolve(version)
    val dataDir = stage.resolve("data").toString

    planned.write.partitionBy(ShardCol).mode(SaveMode.ErrorIfExists)
      .parquet(dataDir)

    // Audit from BYTES: re-read what landed, re-derive the manifest, and
    // require it row-identical to the manifest of the planned input.
    val written = spark.read.parquet(dataDir)
    def manifestOf(df: DataFrame) =
      Assemble.shardManifest(df, ShardCol, idCol, tokensCol, col(csumCol))
    val writtenManifest = manifestOf(written).localCheckpoint()
    if (!manifestsAgree(manifestOf(planned), writtenManifest)) {
      deleteRecursively(stage)
      throw new IllegalStateException(
        s"dataset publish audit failed for $version: written bytes disagree " +
          "with the planned manifest (lost or duplicated rows)")
    }
    writtenManifest.coalesce(1).write.mode(SaveMode.ErrorIfExists)
      .parquet(stage.resolve("manifest").toString)

    val prev = currentVersion
    val tmp = root.resolve(s"_CURRENT.tmp$version")
    Files.writeString(tmp, version)
    Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // GC: everything but the new current and its immediate predecessor
    // (concurrent readers may still hold the old pointer value) — this is
    // also what clears orphaned staging dirs from crashed publishes.
    val keep = Set(Some(version), prev).flatten
    val listing = Files.list(root)
    try listing.filter(p => Files.isDirectory(p) && !keep(p.getFileName.toString))
      .forEach(deleteRecursively(_))
    finally listing.close()

    val counts = writtenManifest
      .agg(count(lit(1)).as("s"), sum(col("n_docs")).as("d"))
      .head()
    Publish(version, counts.getLong(0), counts.getLong(1))
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    finally walk.close()
  }
}
