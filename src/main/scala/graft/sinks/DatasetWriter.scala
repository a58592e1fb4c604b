package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Assemble
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Sharded training-dataset writer: materializes a shard-planned corpus
  * ([[Assemble.shardPlan]] output) as immutable parquet shard directories
  * behind manifest-snapshot versions — append a crawl batch without ever
  * rewriting published data.
  *
  * Layout:
  * {{{
  *   root/shards/shard_id=N/…parquet   immutable, written once, never edited
  *   root/v<ts>/manifest/…parquet      snapshot: the shard rows this version sees
  *   root/_CURRENT                     atomic pointer to the live version
  * }}}
  *
  * A VERSION is a manifest snapshot (shard-scale rows), not a data copy —
  * so `append` is O(batch), never O(dataset): the batch's shards stage,
  * their bytes are audited, the manifest union commits, the pointer
  * flips. At 100 TB an append of a day's crawl touches only that day's
  * shards; the alternative (versioned full datasets) would rewrite
  * everything per batch.
  *
  * Publish/append protocol (pointer discipline as in
  * [[graft.state.ParquetStateStore]]):
  *
  *   1. the batch is planned with shard ids offset past the live
  *      dataset's maximum (fresh ids by construction);
  *   2. shard dirs write to a staging dir, then MOVE into `shards/` —
  *      a same-id leftover from a crashed append is unreferenced by any
  *      manifest (the crash happened before its commit) and is deleted
  *      before the move;
  *   3. the new shards' manifest is RECOMPUTED from bytes read back off
  *      `shards/` and compared (distributed anti-join) to the planned
  *      manifest — lost or duplicated rows fail here, previous version
  *      stays live;
  *   4. old manifest ∪ new manifest writes under a fresh version dir and
  *      `_CURRENT` flips via write-temp + ATOMIC_MOVE — the commit;
  *   5. GC removes versions older than (current, previous) and any shard
  *      dir neither of those manifests references — which also reclaims
  *      orphans of crashed appends.
  *
  * Readers resolve the pointer, then read exactly the shard dirs the
  * manifest lists — never a half-written batch. */
final class DatasetWriter(spark: SparkSession, rootDir: String) {

  private val root: Path = Paths.get(rootDir)
  private def shardsRoot: Path = root.resolve("shards")
  private def pointer: Path = root.resolve("_CURRENT")

  val ShardCol = "shard_id"

  final case class Publish(version: String, nShards: Long, nDocs: Long,
                           firstShard: Long)

  /** True iff the two manifests hold identical row sets — both are
    * shard-scale, compared distributed (symmetric anti-join). */
  private[sinks] def manifestsAgree(a: DataFrame, b: DataFrame): Boolean = {
    val bb = b.select(a.columns.toIndexedSeq.map(col): _*) // align column order
    a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty
  }

  private def currentVersion: Option[String] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim).filter(_.nonEmpty)
    else None

  private def manifestDir(version: String): Path =
    root.resolve(version).resolve("manifest")

  def readManifest(): Option[DataFrame] =
    currentVersion.map(manifestDir).filter(Files.exists(_))
      .map(d => spark.read.parquet(d.toString))

  /** Release audit: [[Assemble.manifestDiff]] of the previous version's
    * manifest against the current one. GC retains exactly (current,
    * previous), so this is always answerable after the second commit; for
    * this append-only store every row must be `added` or `unchanged` — a
    * `removed`/`changed` row means a published shard was touched
    * (spec-pinned). None before a second version exists. */
  def diffFromPrevious(): Option[DataFrame] =
    currentVersion.flatMap { cur =>
      val listing = Files.list(root)
      val prev =
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .filter(p => Files.isDirectory(p) && p.getFileName.toString != cur &&
              p.getFileName.toString.startsWith("v"))
            .map(_.getFileName.toString).toSeq.sorted.lastOption
        } finally listing.close()
      prev.filter(v => Files.exists(manifestDir(v))).map { v =>
        Assemble.manifestDiff(
          spark.read.parquet(manifestDir(v).toString),
          spark.read.parquet(manifestDir(cur).toString), ShardCol)
      }
    }

  /** The live dataset: union of exactly the shard dirs the current
    * manifest lists, with `shard_id` restored from the directory name. */
  def readCurrent(): Option[DataFrame] =
    readManifest().map { m =>
      val ids = m.select(col(ShardCol)).collect().map(_.getLong(0))
      val paths = ids.sorted.map(id => shardsRoot.resolve(s"$ShardCol=$id").toString)
      spark.read.option("basePath", shardsRoot.toString).parquet(paths.toIndexedSeq: _*)
        .withColumn(ShardCol, col(ShardCol).cast("long"))
    }

  /** First publish: plan ids start at 0. Fails if a dataset already
    * exists (use [[append]] to grow one). */
  def publish(planned: DataFrame, idCol: String, tokensCol: String,
              csumCol: String): Publish = {
    require(currentVersion.isEmpty,
      s"dataset already exists at $rootDir — use append")
    commitBatch(planned, idCol, tokensCol, csumCol, shardOffset = 0L, prior = None)
  }

  /** Append a batch: its shard ids continue past the live maximum; only
    * the batch's shards are written. `planned` is [[Assemble.shardPlan]]
    * output over the BATCH alone (each batch balances its own token
    * stream — global order across appends is arrival order, the crawl
    * convention). */
  def append(planned: DataFrame, idCol: String, tokensCol: String,
             csumCol: String): Publish = {
    val prior = readManifest().getOrElse(
      throw new IllegalStateException(s"no dataset at $rootDir — publish first"))
      .localCheckpoint() // survives version GC below
    val offset = prior.agg(max(col(ShardCol))).head().get(0) match {
      case null => 0L // empty dataset published; ids start fresh
      case v: Long => v + 1L
    }
    commitBatch(planned, idCol, tokensCol, csumCol, offset, Some(prior))
  }

  private def commitBatch(planned: DataFrame, idCol: String, tokensCol: String,
                          csumCol: String, shardOffset: Long,
                          prior: Option[DataFrame]): Publish = {
    Files.createDirectories(shardsRoot)
    val version = s"v${System.nanoTime()}"
    val stage = root.resolve(s"_stage-$version")
    val offsetPlanned = planned
      .withColumn(ShardCol, col(ShardCol) + lit(shardOffset))

    // 2. stage the batch's shard dirs, move into the immutable pool
    offsetPlanned.write.partitionBy(ShardCol).mode(SaveMode.ErrorIfExists)
      .parquet(stage.toString)
    val staged = listShardDirs(stage)
    staged.foreach { d =>
      val target = shardsRoot.resolve(d.getFileName.toString)
      // same-id leftovers are orphans of a crashed append (never committed:
      // offsets only ever point past COMMITTED manifests) — safe to replace
      if (Files.exists(target)) deleteRecursively(target)
      Files.move(d, target)
    }
    deleteRecursively(stage)

    // 3. audit the batch from bytes on disk
    val batchPaths = staged.map(d => shardsRoot.resolve(d.getFileName.toString).toString)
    val written = spark.read.option("basePath", shardsRoot.toString)
      .parquet(batchPaths: _*)
      .withColumn(ShardCol, col(ShardCol).cast("long"))
    def manifestOf(df: DataFrame) =
      Assemble.shardManifest(df, ShardCol, idCol, tokensCol, col(csumCol))
    val writtenManifest = manifestOf(written).localCheckpoint()
    if (!manifestsAgree(manifestOf(offsetPlanned), writtenManifest)) {
      batchPaths.foreach(p => deleteRecursively(Paths.get(p)))
      throw new IllegalStateException(
        s"dataset publish audit failed for $version: written bytes disagree " +
          "with the planned manifest (lost or duplicated rows)")
    }

    // 4. manifest snapshot (old ∪ new) + atomic pointer flip
    val full = prior match {
      case Some(p) => p.unionByName(writtenManifest)
      case None => writtenManifest
    }
    full.coalesce(1).write.mode(SaveMode.ErrorIfExists)
      .parquet(manifestDir(version).toString)
    val prev = currentVersion
    val tmp = root.resolve(s"_CURRENT.tmp$version")
    Files.writeString(tmp, version)
    Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // 5. GC: versions beyond (current, previous); shard dirs neither
    // retained manifest references — includes crashed-append orphans
    val keepVersions = Set(Some(version), prev).flatten
    val listing = Files.list(root)
    try listing.filter(p => Files.isDirectory(p) &&
        p.getFileName.toString != "shards" &&
        !keepVersions(p.getFileName.toString))
      .forEach(deleteRecursively(_))
    finally listing.close()
    val referenced: Set[String] = keepVersions.flatMap { v =>
      val d = manifestDir(v)
      if (Files.exists(d))
        spark.read.parquet(d.toString).select(col(ShardCol)).collect()
          .map(r => s"$ShardCol=${r.getLong(0)}").toSet
      else Set.empty[String]
    }
    listShardDirs(shardsRoot)
      .filterNot(d => referenced(d.getFileName.toString))
      .foreach(deleteRecursively(_))

    val counts = writtenManifest
      .agg(count(lit(1)).as("s"), sum(col("n_docs")).as("d"))
      .head()
    Publish(version, counts.getLong(0), counts.getLong(1), shardOffset)
  }

  private def listShardDirs(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val listing = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"$ShardCol="))
    } finally listing.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    finally walk.close()
  }
}
