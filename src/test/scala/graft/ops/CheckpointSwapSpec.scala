package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins that the documented cluster-mode lineage-cut swap is actually
  * DROP-IN (r18 verdict, "what's missing" #3): the same checkpoint-dependent
  * operators, run under `spark.graft.checkpointMode = reliable` (real
  * `setCheckpointDir` + `checkpoint()`) and `persist`, produce output
  * identical to the default localCheckpoint mode. */
class CheckpointSwapSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup
    (4L, "completely unrelated text about distributed query planning"),
    (5L, "another unrelated document mentioning parquet column pruning"),
    (6L, "the quick brown fox jumps over the lazy dog again and again today")
  ).toDF("doc_id", "text")

  private def withMode[T](mode: String)(f: => T): T = {
    spark.conf.set("spark.graft.checkpointMode", mode)
    try f finally spark.conf.unset("spark.graft.checkpointMode")
  }

  test("nearDupSurvivors: reliable checkpoint() is a drop-in swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    def run() = DedupOps.nearDupSurvivors(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    val local = run()
    val reliable = withMode("reliable")(run())
    assert(local == reliable, "reliable checkpoint changed survivor set")
    assert(local.nonEmpty)
    // the reliable run must have actually written checkpoint data
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoint data written")
  }

  test("decontaminate + sourceDupRollup: persist mode is output-identical") {
    def contam() = DedupOps.decontaminate(docs, "doc_id", "text",
        driverTestSet = Some(false)) // force the join path (it carries cuts)
      .select($"doc_id", $"overlap_ppm").as[(Long, Long)].collect().toSet
    def rollup() = DedupOps.sourceDupRollup(
        docs.withColumn("source", (col("doc_id") % 2).cast("string")),
        "doc_id", "text", "source")
      .select($"source", $"n_shingle_occ", $"n_dup_occ")
      .as[(String, Long, Long)].collect().toSet
    val (c0, r0) = (contam(), rollup())
    val (c1, r1) = withMode("persist")((contam(), rollup()))
    assert(c0 == c1 && r0 == r1, "persist mode changed operator output")
  }

  test("duplicatedSpans under reliable mode matches local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    spark.sparkContext.setCheckpointDir(dir)
    def run() = DedupOps.duplicatedSpans(docs, "doc_id", "text")
      .collect().map(_.toString).toSet
    val local = run()
    val reliable = withMode("reliable")(run())
    assert(local == reliable)
  }
}
