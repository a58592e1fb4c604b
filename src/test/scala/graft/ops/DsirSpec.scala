package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Properties of the DSIR-shaped importance resampler. The oracle query
  * (llm_dsir_sample) pins the exact arithmetic; these pin the semantics
  * that make it a useful curation op. */
class DsirSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  test("target slice scores strictly higher on average than every non-target language") {
    val scored = TextOps.dsirResample(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val means = scored.groupBy(col("lang")).agg(avg(col("dsir_pts")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    means.filter(_._1 != "en").foreach { case (lang, m) =>
      assert(means("en") > m,
        s"target 'en' mean ${means("en")} must beat '$lang' mean $m")
    }
  }

  test("target = everything degenerates to the uniform weight (pts in the div-floor band below 1000)") {
    // With t_ppm == r_ppm per bucket the importance ratio is
    // t_ppm·1000 div (r_ppm+1) ≲ 1000; the +1 guard and the two div
    // floors can only pull points DOWN from 1000, never above.
    val pts = TextOps.dsirResample(docs, "doc_id", "text", isTarget = lit(true))
      .agg(min(col("dsir_pts")), max(col("dsir_pts")))
      .collect().head
    assert(pts.getLong(1) <= 1000L, s"max pts ${pts.getLong(1)} above uniform 1000")
    assert(pts.getLong(0) >= 950L, s"min pts ${pts.getLong(0)} far below uniform band")
  }

  test("admission is content-addressed: same corpus, same accepted set on re-run") {
    val run = () => TextOps.dsirResample(docs, "doc_id", "text",
        isTarget = col("lang") === "en")
      .filter(col("accepted")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(run() == run(), "accepted set must be deterministic")
  }

  test("documents with fewer than 2 tokens have no features and are absent") {
    import spark.implicits._
    val tiny = Seq((1L, "alpha beta gamma", true), (2L, "single", false),
      (3L, "", false)).toDF("doc_id", "text", "tgt")
    val out = TextOps.dsirResample(tiny, "doc_id", "text", isTarget = col("tgt"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"expected only the 3-token doc, got $out")
  }
}
