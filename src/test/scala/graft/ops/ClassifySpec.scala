package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classify: integer-exact token classifier + nearest-centroid embedding
  * classifier. The classifier tests check against an independent driver-side
  * reference implementation of the same ppm-points math; the centroid tests
  * pin the truncating-division contract and the argmin tie-break. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // Driver-side reference of the classifier math (same normalization,
  // add-one ppm smoothing, truncating Long division, min-class tie-break).
  private def tok(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toSeq.filter(_.nonEmpty)

  private def refFit(train: Seq[(Long, String, String)])
      : (Seq[String], Map[(String, String), Long], Map[String, Long]) = {
    val occ = train.flatMap { case (_, text, cls) => tok(text).map(_ -> cls) }
    val counts = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = counts.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val v = counts.keys.map(_._1).toSet.size.toLong
    val classes = totals.keys.toSeq.sorted
    val pts = counts.map { case ((t, c), n) =>
      (t, c) -> (n + 1) * Classify.PtsScale / (totals(c) + v)
    }
    val floors = classes.map(c => c -> Classify.PtsScale / (totals(c) + v)).toMap
    (classes, pts, floors)
  }

  private def refPredict(text: String, classes: Seq[String],
                         pts: Map[(String, String), Long],
                         floors: Map[String, Long]): Option[(String, Long)] = {
    val ts = tok(text)
    if (ts.isEmpty) None
    else {
      val scores = classes.map(c =>
        c -> ts.map(t => pts.getOrElse((t, c), floors(c))).sum)
      val best = scores.map(_._2).max
      Some(scores.find(_._2 == best).get) // classes sorted → min class wins ties
    }
  }

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  test("token classifier matches the driver-side reference on a mixed fixture") {
    val train = Seq[(Long, String, String)](
      (1L, "the cat sat on the mat", "en"),
      (2L, "a dog and a cat", "en"),
      (3L, "le chat et le chien", "fr"),
      (4L, "le chien mange", "fr"),
      (5L, "der hund und die katze", "de"))
    val eval = Seq[(Long, String, String)](
      (10L, "the cat and the dog", "en"),
      (11L, "le chat mange le chien", "fr"),
      (12L, "die katze und der hund", "de"),
      (13L, "zzz qqq www", "xx"), // fully OOV -> all-floor tie -> min class
      (14L, "", "en"))            // no tokens -> absent from output
    val m = Classify.fitTokenClassifier(docsDf(train), "doc_id", "text",
      "lang", trainPermille = 1000, salt = "spec")
    val (classes, pts, floors) = refFit(train)
    assert(m.classes == classes)
    assert(m.floors == classes.map(floors))

    val got = Classify.classifyDocs(docsDf(eval), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    val want = eval.flatMap { case (id, text, _) =>
      refPredict(text, classes, pts, floors).map(id -> _)
    }.toMap
    assert(got == want)
    assert(!got.contains(14L))
    assert(got(13L)._1 == classes.head) // OOV tie broken to the min class

    // staleness signal: the fully-OOV doc reports every token OOV, an
    // in-vocabulary doc reports zero
    val oov = Classify.classifyDocs(docsDf(eval), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(oov(13L)._1 == oov(13L)._2 && oov(13L)._2 == 3L)
    assert(oov(11L)._2 == 0L)
  }

  test("token weights readout equals the reference pts table") {
    val train = Seq[(Long, String, String)](
      (1L, "alpha beta beta", "p"), (2L, "beta gamma", "q"))
    val m = Classify.fitTokenClassifier(docsDf(train), "doc_id", "text",
      "lang", 1000, "spec")
    val (_, pts, _) = refFit(train)
    val got = m.weightsLong.collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getLong(2)).toMap
    assert(got == pts)
  }

  test("confusion matrix cells sum to the held-out docs with at least one token") {
    val rows = (1L to 200L).map { i =>
      val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"
      val text = if (i % 17 == 0) "" else s"token$lang word$i common"
      (i, text, lang)
    }
    val df = docsDf(rows)
    val conf = Classify.confusionMatrix(df, "doc_id", "text", "lang", 700, "cls")
    val total = conf.agg(sum("n_docs")).head().getLong(0)
    val expected = df
      .filter(Sampling.bucketOf(col("doc_id"), "cls") >= 700)
      .filter(length(TextOps.normalize(col("text"))) > 0)
      .count()
    assert(total == expected)
  }

  test("randomized: classifier equals the driver-side reference on 20 random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 20).foreach { trial =>
      val nDocs = 5 + rnd.nextInt(40)
      val nCls = 1 + rnd.nextInt(3)
      val rows = (1L to nDocs.toLong).map { id =>
        val text = Seq.fill(rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
          .mkString(" ") // may be empty
        (id, text, s"c${rnd.nextInt(nCls)}")
      }
      // train on the whole trial corpus; classify it too (the split is
      // covered by the confusion test — here we pin the scoring math)
      val hasTokens = rows.exists(_._2.nonEmpty)
      if (hasTokens) {
        val m = Classify.fitTokenClassifier(docsDf(rows), "doc_id", "text",
          "lang", 1000, s"t$trial")
        val (classes, pts, floors) = refFit(rows)
        assert(m.classes == classes, s"trial $trial classes")
        val got = Classify.classifyDocs(docsDf(rows), "doc_id", "text", m)
          .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
        val want = rows.flatMap { case (id, text, _) =>
          refPredict(text, classes, pts, floors).map(id -> _)
        }.toMap
        assert(got == want, s"trial $trial predictions")
      }
    }
  }

  test("broadcast and forced-shuffle scoring paths are output-identical; strategies actually differ") {
    val rows = (1L to 120L).map { i =>
      (i, s"shared${i % 7} tok$i shared${(i + 3) % 7}",
        if (i % 2 == 0) "en" else "fr")
    }
    val m = Classify.fitTokenClassifier(docsDf(rows), "doc_id", "text",
      "lang", 1000, "spec")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val bc = Classify.classifyDocs(docsDf(rows), "doc_id", "text", m)
    val bcKey = key(bc)
    // The over-cap fallback drops the broadcast HINT; at fixture scale
    // Catalyst's own size threshold (and AQE) would still broadcast the
    // tiny table — which is exactly right — so to pin the strategy
    // difference the threshold is disabled: a genuinely over-cap model at
    // scale is over that threshold too, and must plan a shuffle join.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (shKey, shPlan) = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sh = Classify.classifyDocs(docsDf(rows), "doc_id", "text", m,
        broadcastMaxTokens = 0L)
      (key(sh), sh.queryExecution.sparkPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert(bcKey == shKey)
    assert(bc.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
      "under the cap the model join must broadcast")
    assert(!shPlan.contains("BroadcastHashJoin"),
      "over the cap (threshold off) the planned model join must not broadcast")
  }

  test("centroid model uses truncating division (negative sums round toward zero)") {
    val emb = Seq(
      (1L, Seq(-0.001f, 0.003f), 0),
      (2L, Seq(-0.002f, 0.000f), 0))
      .toDF("vec_id", "embedding", "label")
    val m = Classify.centroidModel(emb, trainPermille = 1000, salt = "spec")
      .collect()
    assert(m.length == 1)
    assert(m.head.getLong(1) == 2L)
    // sums (-3, 3) over n=2: div truncates toward zero -> (-1, 1), not (-2, 1)
    assert(m.head.getSeq[Long](2) == Seq(-1L, 1L))
  }

  test("centroid confusion is diagonal on separable clusters; ties pick the min label") {
    val rows =
      (1L to 40L).map(i => (i, Seq(1.0f + (i % 5) * 0.001f, 0.0f), 0)) ++
      (41L to 80L).map(i => (i, Seq(0.0f, 1.0f + (i % 5) * 0.001f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    // sanity: the content-addressed split leaves train+eval rows per label
    val bucket = Sampling.bucketOf(col("vec_id"), "cent")
    Seq(0, 1).foreach { l =>
      assert(emb.filter(col("label") === l && bucket < 700).count() > 0)
      assert(emb.filter(col("label") === l && bucket >= 700).count() > 0)
    }
    val conf = Classify.centroidConfusion(emb, 700, "cent").collect()
    assert(conf.forall(r => r.getInt(0) == r.getInt(1)))
    val evalN = emb.filter(bucket >= 700).count()
    assert(conf.map(_.getLong(2)).sum == evalN)

    // Equidistant probe: exact mirror clusters give centroids (1000,0) and
    // (0,1000) regardless of which ids land in the train slice, so the
    // origin ties exactly -> pred = min label 0. The probe id is picked at
    // runtime from the eval slice.
    val mirror =
      ((1L to 40L).map(i => (i, Seq(1.0f, 0.0f), 0)) ++
       (41L to 80L).map(i => (i, Seq(0.0f, 1.0f), 1)))
        .toDF("vec_id", "embedding", "label")
    val probeId: Long = spark.range(900, 999)
      .filter(Sampling.bucketOf(col("id"), "cent") >= 700)
      .head()
    val withTie = mirror.union(
      Seq((probeId, Seq(0.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label"))
    val conf2 = Classify.centroidConfusion(withTie, 700, "cent")
      .filter(col("actual") === 1 && col("pred") === 0).collect()
    assert(conf2.map(_.getLong(2)).sum >= 1L)
  }

  test("centroid drift: identical cohorts drift 0; a planted shift spikes its label only") {
    val base = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val zero = Classify.centroidDrift(base, base).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(zero === Map(0 -> 0L, 1 -> 0L))
    // shift label 1 by (0, 0.5) in cohort B: drift = 500² = 250000 milli²
    val shifted = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.5f), 1), (4L, Seq(0.0f, 1.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Classify.centroidDrift(base, shifted).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got === Map(0 -> 0L, 1 -> 250000L))
    // a label absent from one cohort drops symmetrically (inner join)
    val missing = Classify.centroidDrift(base,
      shifted.filter(col("label") === 0)).collect().map(_.getInt(0)).toSet
    assert(missing === Set(0))
  }
}
