package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-aware curation ops (knnLabelAudit, hardNegatives) and the
  * reference-frequency quality scorer: planted-defect detection, bound
  * checks, and small/large path equality on the size-dispatched audit. */
class LabelQualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  /** Two tight clusters far apart: label 0 around +e_i axes, label 1 around
    * the negated axes; vector 42 sits IN the label-0 cluster but carries
    * label 1 — the planted mislabel. Floats are exact binary fractions so
    * quantization is deterministic. */
  private def plantedCorpus: DataFrame = {
    val dim = 64
    def v(sign: Float, jitterIdx: Int): Array[Float] =
      Array.tabulate(dim)(i => sign * (1f + 0.25f * ((i + jitterIdx) % 4)))
    val rows =
      (0 until 12).map(i => (i.toLong, v(1f, i), 0)) ++
      (12 until 24).map(i => (i.toLong, v(-1f, i), 1)) :+
      ((42L, v(1f, 3), 1)) // geometrically label-0, tagged label-1
    rows.toDF("vec_id", "embedding", "label")
  }

  test("knnLabelAudit flags the planted mislabel and trusts clean cluster members") {
    val audit = Similarity.knnLabelAudit(plantedCorpus, k = 5,
      numCentroids = 2, minPurityPpm = 500000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    val (purity42, suspect42) = audit(42L)
    assert(suspect42, "planted mislabel must be flagged")
    assert(purity42 == 0L, "all of 42's neighbours carry the other label")
    // clean label-0 members: neighbours are overwhelmingly label-0
    (0 until 12).foreach { i =>
      val (p, s) = audit(i.toLong)
      assert(!s && p >= 800000L, s"clean vector $i flagged (purity $p)")
    }
  }

  test("knnLabelAudit: purity bounds, n_same <= n_nbrs, one row per non-singleton vector") {
    val audit = Similarity.knnLabelAudit(plantedCorpus, k = 3, numCentroids = 2)
    val c = audit.collect()
    assert(c.length == 25, "every vector sits in a cell with neighbours")
    c.foreach { r =>
      val (nbrs, same, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(same <= nbrs && nbrs <= 3)
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(ppm == same * 1000000L / nbrs)
    }
  }

  test("knnLabelAudit: literal-argmax path equals the broadcast-aggregate path") {
    assert(rows(Similarity.knnLabelAudit(plantedCorpus, k = 5, numCentroids = 2)) ==
      rows(Similarity.knnLabelAudit(plantedCorpus, k = 5, numCentroids = 2,
        smallCap = 0)))
  }

  test("hardNegatives returns only different-label neighbours, ranked densely") {
    val q = plantedCorpus.filter(col("vec_id") === 42L)
    val negs = Similarity.hardNegatives(plantedCorpus, q, k = 6).collect()
    assert(negs.length == 6)
    assert(negs.forall(_.getLong(4) != 1L), "negatives must differ from the query label")
    assert(negs.map(_.getInt(1)).sorted.toSeq == (1 to 6),
      "ranks dense from 1")
    // 42 is geometrically label-0, so its hardest label-0 "negatives" are
    // its own cluster's members — the exact confusable pairs mining exists for
    assert(negs.forall(r => r.getLong(2) < 12L))
  }

  test("refFreqQuality: rare-token docs score higher rarity; OOV counted; empty docs absent") {
    // reference slice is content-addressed; with 40 docs over permille 500
    // both sides are populated. Tokens: 'common' appears everywhere,
    // 'rare<i>' in two docs each, 'zz<i>' once each (OOV at minDf=2).
    val docs = ((0 until 40).map { i =>
      val extra = if (i % 2 == 0) s" rare${i % 4} rare${i % 4}" else ""
      (i.toLong, s"common common common$extra")
    } :+ ((100L, "zz1 zz2 zz3 common")) :+ ((101L, "...")))
      .toDF("doc_id", "text")
    val out = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec")
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(!byId.contains(101L), "empty-normalized doc has no token rows")
    val (n100, oov100, rar100) = byId(100L)
    assert(n100 == 4 && oov100 == 750000L,
      "three singleton tokens of four are OOV")
    val rareDoc = byId.collect { case (id, v) if id % 2 == 0 && id < 40 => v }
    val commonDoc = byId.collect { case (id, v) if id % 2 == 1 && id < 40 => v }
    assert(rareDoc.map(_._3).min > commonDoc.map(_._3).max,
      "docs carrying rare tokens outscore all-common docs on rarity")
    assert(commonDoc.forall(_._2 == 0L), "all-common docs have zero OOV")
  }

  test("integrityAudit: planted dim violation, zero vector, and orphan are each counted") {
    val emb = Seq(
      (0L, Array(0.5f, 0.5f), 0),     // clean, paired: norm2 = 2*500²
      (1L, Array(0.25f, 0.75f), 0),   // clean, paired
      (2L, Array(0.5f), 0),           // dim violation (1 != 2)
      (3L, Array(0f, 0f), 1),         // zero vector
      (9L, Array(1f, 1f), 1)          // orphan: no doc row 9
    ).toDF("vec_id", "embedding", "label")
    val docs = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
      .toDF("doc_id", "text")
    val got = Similarity.integrityAudit(emb, docs,
        "vec_id", "doc_id", "embedding", "label", dim = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // label, n_vecs, n_dim_bad, n_zero, min_norm2, max_norm2, n_unpaired
    assert(got(0L) === ((0L, 3L, 1L, 0L, 250000L, 625000L, 0L)))
    assert(got(1L) === ((1L, 2L, 0L, 1L, 0L, 2000000L, 1L)))
  }
}
