package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the real multi-frame GIF path: the executor-side sequence writer /
  * reader round-trip must land exactly on the generative formula (that is
  * what lets the mm_real_scenecuts oracle replay features without
  * decoding), and corrupt / truncated payloads must degrade row-locally. */
class GifSceneCutsSpec extends SparkSpec {
  import spark.implicits._

  private def expected(id: Long, threshold: Long): (Long, Long, Long) = {
    val n = 3 + (id % 4).toInt
    val feats = (0 until n).map(f => (id * 37 + f * 97) % 251)
    val deltas = feats.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
    (n.toLong, deltas.count(_ >= threshold).toLong, deltas.sum)
  }

  test("decoded scene cuts equal the generative formula for every id") {
    val ids = (1L to 40L).filter(_ % 7 != 0)
    val media = Multimodal.syntheticGifs(ids.toDF("doc_id"), corruptMod = 7)
    val out = Multimodal.realSceneCuts(media, cutThreshold = 64L)
      .collect().map(r => r.doc_id -> r).toMap
    ids.foreach { id =>
      val (n, cuts, motion) = expected(id, 64L)
      val r = out(id)
      assert(r.ok, s"id $id failed to decode")
      assert((r.n_frames, r.n_cuts, r.motion_sum) === ((n, cuts, motion)),
        s"id $id: got (${r.n_frames}, ${r.n_cuts}, ${r.motion_sum}), want ($n, $cuts, $motion)")
    }
  }

  test("corrupt payload degrades to ok=false, never throws") {
    val media = Multimodal.syntheticGifs(Seq(7L, 14L).toDF("doc_id"), corruptMod = 7)
    val out = Multimodal.realSceneCuts(media).collect()
    assert(out.forall(r => !r.ok && r.n_frames == 0))
  }

  test("truncated GIF drops tail frames row-locally; ok stays true") {
    val full = Multimodal.syntheticGifs(Seq(5L).toDF("doc_id"), corruptMod = 0)
      .select("media").head().getAs[Array[Byte]](0)
    val fullFrames = expected(5L, 64L)._1
    // solid frames LZW-compress to ~30 bytes while the 256-gray global
    // palette alone is 768 — a proportional cut would land inside the
    // header; chop 15 tail bytes to corrupt exactly the last frame
    val cut = full.take(full.length - 15)
    val out = Multimodal.realSceneCuts(
      Seq((5L, cut)).toDF("doc_id", "media")).head()
    assert(out.ok, "a truncated stream with a decodable prefix must stay ok")
    assert(out.n_frames >= 1 && out.n_frames < fullFrames,
      s"expected a partial frame count, got ${out.n_frames} of $fullFrames")
  }
}
