package graft.ops

import graft.SparkSpec
import scala.util.Random

/** Randomized cross-check of [[DedupOps.removeDuplicatedSpans]] against an
  * INDEPENDENT driver-side reference implementing the contract directly:
  * width-token windows, duplicated = present in >1 distinct doc, keeper =
  * lexicographically smallest (doc, idx), masked positions = union of
  * non-keeper window extents, reassembly from surviving tokens in order.
  * A tiny vocabulary forces dense cross-doc collisions, self-overlapping
  * repeats, and fully-masked docs — the shapes where an off-by-one in the
  * window arithmetic or the keeper election would hide.
  *
  * Fixed seed, four trials (both keepFirst modes) — deterministic in CI. */
class SpanRemovalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(docs: Seq[(Long, String)], width: Int,
                        keepFirst: Boolean): Map[Long, (String, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty).toVector
    }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq
      i <- 0 to tk.length - width
      if tk.length >= width
    } yield (tk.slice(i, i + width).mkString(" "), id, i)
    val byn = occ.groupBy(_._1).filter { case (_, os) =>
      os.map(_._2).distinct.length > 1
    }
    val keepers = byn.map { case (s, os) =>
      s -> os.map(o => (o._2, o._3)).min
    }
    val masked = occ.filter { case (s, id, i) =>
      byn.contains(s) && (!keepFirst || keepers(s) != ((id, i)))
    }
    docs.map { case (id, _) =>
      val tk = toks(id)
      val m = masked.collect { case (_, `id`, i) => i }
      val maskedPos = m.flatMap(i => i until i + width).toSet
      val kept = tk.zipWithIndex.collect { case (t, p) if !maskedPos(p) => t }
      id -> ((kept.mkString(" "), tk.length.toLong,
        (tk.length - kept.length).toLong, m.length.toLong))
    }.toMap
  }

  test("random tiny-vocab corpora match the driver reference in both keepFirst modes") {
    val rnd = new Random(20260815L)
    val vocab = Vector("aa", "bb", "cc", "dd")
    for (trial <- 1 to 2; keepFirst <- Seq(true, false)) {
      val docs = (0L until 12L).map { id =>
        val n = rnd.nextInt(14) // includes < width and empty docs
        id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val width = 3
      val got = DedupOps.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", width = width, keepFirst = keepFirst)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val exp = reference(docs, width, keepFirst)
      assert(got == exp,
        s"trial $trial keepFirst=$keepFirst:\n got=$got\n exp=$exp\n docs=$docs")
    }
  }
}
