package graft.sinks

import graft.SparkSpec
import graft.ops.Assemble
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class DatasetWriterSpec extends SparkSpec {
  import spark.implicits._

  private def planned(n: Int) = {
    val docs = (1 to n).map(i => (i.toLong, s"text body $i", 5L + (i % 7)))
      .toDF("doc_id", "text", "n_tokens")
      .withColumn("_csum", Assemble.contentChecksumTerm($"text"))
    Assemble.shardPlan(docs, "doc_id", "n_tokens", shardTokens = 50L, salt = "w")
  }

  private def freshRoot() =
    Files.createTempDirectory("graft-dataset").toString

  test("publish writes shard-partitioned parquet, an audited manifest, and flips the pointer") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    assert(w.readCurrent().isEmpty, "no dataset before first publish")
    val pub = w.publish(planned(100), "doc_id", "n_tokens", "_csum")
    assert(pub.nDocs == 100)
    assert(pub.nShards > 1, "budget 50 over ~100 docs must cut multiple shards")
    // data is physically partitioned by shard
    val dataDir = Paths.get(w.currentDataDir.get)
    val shardDirs = Files.list(dataDir).filter(p =>
      p.getFileName.toString.startsWith("shard_id=")).count()
    assert(shardDirs == pub.nShards, s"$shardDirs shard dirs vs ${pub.nShards}")
    // round-trip: written rows = planned rows; manifest matches a fresh
    // recompute from the read-back bytes
    val back = w.readCurrent().get
    assert(back.count() == 100)
    val recomputed = Assemble.shardManifest(back, "shard_id", "doc_id",
      "n_tokens", $"_csum")
    assert(w.manifestsAgree(w.readManifest().get, recomputed),
      "stored manifest must equal a recompute from disk bytes")
  }

  test("re-publish supersedes atomically; readers of the old pointer stay consistent; orphans GC") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    val p1 = w.publish(planned(60), "doc_id", "n_tokens", "_csum")
    // simulate a crashed publish: an orphan staging dir with data but no
    // pointer flip — readers must not see it
    val orphan = Paths.get(root, "v0-crashed")
    Files.createDirectories(orphan.resolve("data"))
    Files.writeString(orphan.resolve("data").resolve("junk"), "partial")
    assert(w.readCurrent().get.count() == 60, "orphan invisible to readers")
    val p2 = w.publish(planned(90), "doc_id", "n_tokens", "_csum")
    assert(p2.version != p1.version)
    assert(w.readCurrent().get.count() == 90)
    assert(!Files.exists(orphan), "crashed staging dir GC'd by next publish")
    // previous version retained for in-flight readers, older ones gone
    val versions = Files.list(Paths.get(root)).filter(Files.isDirectory(_))
      .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
    assert(versions == Set(p1.version, p2.version), s"kept: $versions")
  }

  test("audit failure leaves the previous version live and cleans its staging dir") {
    val root = freshRoot()
    val w = new DatasetWriter(spark, root)
    w.publish(planned(40), "doc_id", "n_tokens", "_csum")
    // a plan whose manifest cannot match its own written bytes: _csum is
    // genuinely non-deterministic per EVALUATION (rand() would not do —
    // its seed freezes at analysis, so write and audit would agree), so
    // the written bytes and the audit's re-evaluation must differ
    val jitter = udf(() => scala.util.Random.nextLong(1000003L)).asNondeterministic()
    val poisoned = planned(40).withColumn("_csum", jitter())
    val e = intercept[IllegalStateException] {
      w.publish(poisoned, "doc_id", "n_tokens", "_csum")
    }
    assert(e.getMessage.contains("audit failed"))
    assert(w.readCurrent().get.count() == 40, "previous version still live")
    val versions = Files.list(Paths.get(root)).filter(Files.isDirectory(_)).count()
    assert(versions == 1, "failed staging dir removed")
  }
}
