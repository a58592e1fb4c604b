package graft.sinks

import graft.SparkSpec
import graft.ops.Assemble
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class DatasetWriterSpec extends SparkSpec {
  import spark.implicits._

  private def planned(ids: Range) = {
    val docs = ids.map(i => (i.toLong, s"text body $i", 5L + (i % 7)))
      .toSeq.toDF("doc_id", "text", "n_tokens")
      .withColumn("_csum", Assemble.contentChecksumTerm($"text"))
    Assemble.shardPlan(docs, "doc_id", "n_tokens", shardTokens = 50L, salt = "w")
  }

  private def freshRoot() =
    Files.createTempDirectory("graft-dataset").toString

  test("publish writes immutable shard dirs, an audited manifest snapshot, and flips the pointer") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    assert(w.readCurrent().isEmpty, "no dataset before first publish")
    val pub = w.publish(planned(1 to 100), "doc_id", "n_tokens", "_csum")
    assert(pub.nDocs == 100)
    assert(pub.nShards > 1, "budget 50 over ~100 docs must cut multiple shards")
    assert(pub.firstShard == 0L)
    val shardDirs = Files.list(Paths.get(root, "shards")).filter(p =>
      p.getFileName.toString.startsWith("shard_id=")).count()
    assert(shardDirs == pub.nShards, s"$shardDirs shard dirs vs ${pub.nShards}")
    // round-trip: reader sees exactly the planned rows; stored manifest
    // equals a fresh recompute from the bytes the reader gets
    val back = w.readCurrent().get
    assert(back.count() == 100)
    val recomputed = Assemble.shardManifest(back, "shard_id", "doc_id",
      "n_tokens", $"_csum")
    assert(w.manifestsAgree(w.readManifest().get, recomputed),
      "stored manifest must equal a recompute from disk bytes")
  }

  test("append is O(batch): new shard ids continue, old shard dirs untouched, reader sees the union") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    val p1 = w.publish(planned(1 to 60), "doc_id", "n_tokens", "_csum")
    val mtimes = Files.list(Paths.get(root, "shards")).map[(String, Long)](p =>
      (p.getFileName.toString, Files.getLastModifiedTime(p).toMillis))
      .toArray.map(_.asInstanceOf[(String, Long)]).toMap
    val p2 = w.append(planned(1000 to 1089), "doc_id", "n_tokens", "_csum")
    assert(p2.firstShard > 0 && p2.firstShard == p1.nShards,
      s"append ids continue past the live max (got ${p2.firstShard})")
    val back = w.readCurrent().get
    assert(back.count() == 60 + 90)
    assert(w.readManifest().get.count() == p1.nShards + p2.nShards)
    // published shard dirs are immutable under append
    mtimes.foreach { case (name, t0) =>
      val p = Paths.get(root, "shards", name)
      assert(Files.exists(p), s"$name removed by append")
      assert(Files.getLastModifiedTime(p).toMillis == t0, s"$name rewritten")
    }
    // doc-level: both batches fully present
    val ids = back.select($"doc_id").as[Long].collect().toSet
    assert((1 to 60).forall(i => ids(i.toLong)))
    assert((1000 to 1089).forall(i => ids(i.toLong)))
    // release audit: the version diff is exactly "old unchanged, batch
    // added" — the append-only invariant as data
    val byStatus = w.diffFromPrevious().get.groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus == Map("unchanged" -> p1.nShards, "added" -> p2.nShards),
      s"append diff must be unchanged+added only, got $byStatus")
  }

  test("diffFromPrevious is None before a second version exists") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    assert(w.diffFromPrevious().isEmpty)
    w.publish(planned(1 to 30), "doc_id", "n_tokens", "_csum")
    assert(w.diffFromPrevious().isEmpty, "one version — nothing to diff")
  }

  test("crashed-append orphans are invisible and GC'd; old versions pruned to current+previous") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    val p1 = w.publish(planned(1 to 60), "doc_id", "n_tokens", "_csum")
    // simulate a crash AFTER shard-dir move, BEFORE manifest commit: a
    // shard dir in the pool no manifest references, plus a staging dir
    val orphanShard = Paths.get(root, "shards", s"shard_id=${p1.nShards}")
    Files.createDirectories(orphanShard)
    Files.writeString(orphanShard.resolve("part-junk"), "partial")
    val orphanStage = Paths.get(root, "_stage-vcrashed")
    Files.createDirectories(orphanStage)
    assert(w.readCurrent().get.count() == 60, "orphans invisible to readers")
    // next append reuses the orphan's id (offset comes from the MANIFEST,
    // not the disk) and must replace it cleanly
    val p2 = w.append(planned(1000 to 1029), "doc_id", "n_tokens", "_csum")
    assert(p2.firstShard == p1.nShards)
    assert(!Files.exists(orphanStage), "staging orphan GC'd")
    assert(w.readCurrent().get.count() == 90)
    val p3 = w.append(planned(2000 to 2029), "doc_id", "n_tokens", "_csum")
    val versions = Files.list(Paths.get(root)).filter(p =>
        Files.isDirectory(p) && p.getFileName.toString.startsWith("v"))
      .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
    assert(versions == Set(p2.version, p3.version),
      s"versions pruned to current+previous, got $versions")
  }

  test("audit failure leaves the previous version live and removes the batch's shards") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    val p1 = w.publish(planned(1 to 40), "doc_id", "n_tokens", "_csum")
    // a plan whose manifest cannot match its own written bytes: _csum is
    // genuinely non-deterministic per EVALUATION (rand() would not do —
    // its seed freezes at analysis, so write and audit would agree)
    val jitter = udf(() => scala.util.Random.nextLong(1000003L)).asNondeterministic()
    val poisoned = planned(1000 to 1039).withColumn("_csum", jitter())
    val e = intercept[IllegalStateException] {
      w.append(poisoned, "doc_id", "n_tokens", "_csum")
    }
    assert(e.getMessage.contains("audit failed"))
    assert(w.readCurrent().get.count() == 40, "previous version still live")
    val shardDirs = Files.list(Paths.get(root, "shards")).filter(p =>
      p.getFileName.toString.startsWith("shard_id=")).count()
    assert(shardDirs == p1.nShards, "failed batch's shard dirs removed")
  }
}
