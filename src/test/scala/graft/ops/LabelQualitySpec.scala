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

  /** Four clusters on DISJOINT 16-coordinate blocks: ids 0-3 are one seed
    * per cluster (cells), supers = cells {0, 1}. Cross-block dots are
    * exactly 0, so every routing argmax is decisive-or-tied-to-lowest-id
    * and the two-level hierarchy reproduces the flat assignment EXACTLY —
    * the fixture where path equality is a theorem, not luck. */
  private def blockCorpus: DataFrame = {
    val dim = 64
    def v(cluster: Int, jitterIdx: Int): Array[Float] =
      Array.tabulate(dim)(i =>
        if (i / 16 == cluster) 1f + 0.25f * ((i + jitterIdx) % 4) else 0f)
    val rows = (0 until 40).map { i =>
      (i.toLong, v(i % 4, i / 4), (i % 4) % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("knnLabelAudit: two-level path ≡ flat paths on a separated fixture (dispatch wired)") {
    val small = rows(Similarity.knnLabelAudit(blockCorpus, k = 5, numCentroids = 4))
    val flat = rows(Similarity.knnLabelAudit(blockCorpus, k = 5, numCentroids = 4,
      smallCap = 0, twoLevelCells = Int.MaxValue))
    val two = rows(Similarity.knnLabelAudit(blockCorpus, k = 5, numCentroids = 4,
      smallCap = 0, twoLevelCells = 1))
    assert(two == flat, "two-level assignment diverged from flat on separated clusters")
    assert(two == small, "two-level path diverged from the fused small path")
  }

  test("knnLabelAudit: twoLevelCells dispatch boundary picks the hierarchy exactly at C >= threshold") {
    // A fixture where the hierarchy APPROXIMATES (so the branches are
    // distinguishable by output, not by plan — localCheckpoint hides the
    // assignment subtree behind a LogicalRDD): the probe vector's flat-
    // nearest cell (2) routes under super 0, but the probe itself routes
    // to super 1, so two-level assigns it to cell 1 instead.
    val dim = 64
    def mix(a: Int, b: Int, wb: Float): Array[Float] =
      Array.tabulate(dim)(i =>
        if (i / 16 == a) 1f else if (i / 16 == b) wb else 0f)
    val fixture = Seq[(Long, Array[Float], Int)](
      (0L, mix(0, 0, 0f), 0),       // cell 0: pure block 0 (super 0)
      (1L, mix(1, 1, 0f), 1),       // cell 1: pure block 1 (super 1)
      (2L, mix(2, 0, 0.5f), 0),     // cell 2 → routes under super 0
      (3L, mix(3, 1, 0.5f), 1),     // cell 3 → routes under super 1
      (16L, mix(2, 1, 0.5f), 0)) ++ // probe: flat→cell 2, two-level→cell 1
      (4 until 16).map(i => (i.toLong, mix(i % 4, i % 4, 0f), i % 2))
    val df = fixture.toDF("vec_id", "embedding", "label")
    def audit(tlc: Int) = rows(Similarity.knnLabelAudit(df, k = 5,
      numCentroids = 4, smallCap = 0, twoLevelCells = tlc))
    val forcedTwo = audit(1)               // always-hierarchy reference
    val forcedFlat = audit(Int.MaxValue)   // never-hierarchy reference
    assert(forcedTwo != forcedFlat,
      "fixture must make the approximation visible or the pin is vacuous")
    assert(audit(4) == forcedTwo, "C == threshold must dispatch two-level")
    assert(audit(5) == forcedFlat, "C < threshold must dispatch flat")
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

  test("refFreqQuality: map-only driver-vocab tier is row-identical to the " +
      "join tiers; the cap-0 flip selects the join (r19)") {
    val docs = ((0 until 60).map { i =>
      val extra = if (i % 3 == 0) s" rare${i % 5} spice${i % 7}" else ""
      (i.toLong, s"common words everywhere$extra")
    } :+ ((200L, "qq1 qq2 qq3 common")) :+ ((201L, "")))
      .toDF("doc_id", "text")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    val auto = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2")
    val forcedDriver = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2", driverVocab = Some(true))
    val forcedJoin = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2", driverVocab = Some(false))
    assert(rowsOf(forcedDriver) == rowsOf(forcedJoin),
      "driver-vocab and join tiers must be row-identical")
    assert(rowsOf(auto) == rowsOf(forcedJoin))
    assert(!auto.queryExecution.analyzed.toString.contains("Join"),
      "the tiny vocab must auto-select the map-only tier (no Join in the plan)")
    val capped = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2", maxDriverVocab = 0L)
    assert(capped.queryExecution.analyzed.toString.contains("Join"),
      "cap 0 must fall back to the join tiers")
    assert(rowsOf(capped) == rowsOf(forcedJoin))
    // non-zero cap BELOW the vocab size: the bounded vocab_mins probe
    // returns cap+1 entries and the join tiers take over without the full
    // vocab ever materializing in one aggregate row (r20 advice fix)
    val capped2 = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2", maxDriverVocab = 2L)
    assert(capped2.queryExecution.analyzed.toString.contains("Join"),
      "an over-cap vocab must fall back to the join tiers")
    assert(rowsOf(capped2) == rowsOf(forcedJoin))
    // forced driver tier with an over-cap vocab: completes the full fetch
    // (the spec lever) and stays map-only + row-identical
    val forcedTiny = TextOps.refFreqQuality(docs, "doc_id", "text",
      refPermille = 500, minDf = 2, salt = "spec2", driverVocab = Some(true),
      maxDriverVocab = 2L)
    assert(!forcedTiny.queryExecution.analyzed.toString.contains("Join"))
    assert(rowsOf(forcedTiny) == rowsOf(forcedJoin))
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
