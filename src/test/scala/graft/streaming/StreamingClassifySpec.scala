package graft.streaming

import graft.SparkSpec
import graft.ops.Classify
import graft.state.ParquetStateStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Train-offline / serve-in-stream classifier gate: versioned model
  * snapshots, hot swap between micro-batches, idempotent per-batch output,
  * and equality with the batch operator on the same batches. */
class StreamingClassifySpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  private val trainV1 = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "a dog and a cat", "en"),
    (3L, "le chat et le chien", "fr"),
    (4L, "le chien mange", "fr"))
  // v2 swaps the vocabulary between classes: predictions must flip with it.
  private val trainV2 = trainV1.map { case (id, text, lang) =>
    (id, text, if (lang == "en") "fr" else "en")
  }

  test("model snapshot round-trips bit-exactly through the store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scls")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val m = Classify.fitTokenClassifier(docsDf(trainV1), "doc_id", "text",
      "lang", 1000, "spec")
    StreamingClassify.saveModel(store, "gate", m, version = 1L)
    val (loaded, v) = StreamingClassify.loadModel(spark, store, "gate").get
    assert(v == 1L)
    assert(loaded.classes == m.classes && loaded.floors == m.floors)
    val a = m.weightsLong.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val b = loaded.weightsLong.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("streamed scores equal the batch operator; hot swap retags and reflips mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scls2")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val outDir = dir.resolve("out").toString
    val m1 = Classify.fitTokenClassifier(docsDf(trainV1), "doc_id", "text",
      "lang", 1000, "spec")
    StreamingClassify.saveModel(store, "gate", m1, 1L)

    val b1 = Seq((10L, "the cat and the dog"), (11L, "le chat mange"))
    val b2 = Seq((12L, "le chien et le chat"), (13L, ""))

    val m2 = Classify.fitTokenClassifier(docsDf(trainV2), "doc_id", "text",
      "lang", 1000, "spec")
    val input = MemoryStream[(Long, String)]
    val q = StreamingClassify.start(spark, input.toDF().toDF("doc_id", "text"),
      store, "gate", outDir, dir.resolve("ckpt").toString)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      // hot swap to v2 between batches — no restart
      StreamingClassify.saveModel(store, "gate", m2, 2L)
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(s"$outDir/batch=*")
    def batchRows(m: Classify.TokenClassifier, rows: Seq[(Long, String)]) =
      Classify.classifyDocs(rows.toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val got = out.select(col("doc_id"), col("pred"), col("pts"), col("model_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want =
      batchRows(m1, b1).map { case (id, p, s) => (id, p, s, 1L) } ++
      batchRows(m2, b2).map { case (id, p, s) => (id, p, s, 2L) }
    assert(got == want)
    assert(!got.exists(_._1 == 13L)) // empty doc absent on both paths
    // the same text classifies differently under v1 and v2 (the swap is real)
    val probe = Seq((99L, "le chat et le chien"))
    val p1 = batchRows(m1, probe).head._2
    val p2 = batchRows(m2, probe).head._2
    assert(p1 != p2)
  }

  test("replayed batch rewrites its directory idempotently; pre-model batches are empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scls3")
    val store = new ParquetStateStore(spark, dir.resolve("state").toString)
    val outDir = dir.resolve("out").toString
    val batch = Seq((20L, "the cat"), (21L, "le chien")).toDF("doc_id", "text")

    // no model yet: the directory must land, empty, with the full schema
    assert(StreamingClassify.scoreBatch(store, "gate", batch, 0L, outDir) == 0L)
    val empty = spark.read.parquet(s"$outDir/batch=0")
    assert(empty.count() == 0 &&
      empty.columns.toSet ==
        Set("doc_id", "n_tokens", "pred", "pts", "oov_tokens", "model_version"))

    val m = Classify.fitTokenClassifier(docsDf(trainV1), "doc_id", "text",
      "lang", 1000, "spec")
    StreamingClassify.saveModel(store, "gate", m, 7L)
    val n1 = StreamingClassify.scoreBatch(store, "gate", batch, 1L, outDir)
    val first = spark.read.parquet(s"$outDir/batch=1").collect()
      .map(r => r.toSeq).toSet
    val n2 = StreamingClassify.scoreBatch(store, "gate", batch, 1L, outDir) // replay
    val second = spark.read.parquet(s"$outDir/batch=1").collect()
      .map(r => r.toSeq).toSet
    assert(n1 == 2L && n2 == 2L && first == second)
  }
}
