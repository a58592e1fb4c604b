package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantization pins: code range, the per-dimension error
  * bound the codec guarantees, the constant-dimension span guard, and a
  * driver-reference recompute of the full integer pipeline. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Double])], dims: Int) =
    Similarity.sq8Quantize(
        vecs.toDF("vec_id", "embedding")
          // the real schema is FLOAT[]; quantize_milli is float-typed
          .withColumn("embedding", col("embedding").cast("array<float>")),
        "vec_id", "embedding", dims)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("codes in [0,255]; extremes map to 0/255; constant dim encodes 0 " +
    "(span guard); error bounded by span div 255 per dim") {
    val vecs = Seq(
      1L -> Seq(0.0, 5.0, 1.0),
      2L -> Seq(1.0, 5.0, 3.0),
      3L -> Seq(0.5, 5.0, 2.0))
    val out = run(vecs, 3)
    val codes = out.map { case (id, (s, _)) => id -> s.split(",").map(_.toLong) }
    // dim 0: min 0, max 1000 milli → v1: 0, v2: 255, v3: 500*255/1000 = 127
    assert(codes(1L)(0) == 0L && codes(2L)(0) == 255L && codes(3L)(0) == 127L)
    // dim 1 constant: span guard 1, diff 0 → code 0 everywhere, zero error
    assert(codes.values.forall(_(1) == 0L))
    assert(codes.values.forall(_.forall(c => c >= 0L && c <= 255L)))
    // per-dim reconstruction error < span/255 + 1 milli by construction;
    // spans are 1000/1/2000 → total error bound loose-checked
    assert(out.values.forall(_._2 <= (1000L / 255 + 1) + 0 + (2000L / 255 + 1)))
  }

  test("randomized driver-reference recompute of codes and error sums") {
    val rnd = new scala.util.Random(73)
    val dims = 16
    val vecs = (1L to 120L).map(id =>
      id -> Seq.fill(dims)(rnd.nextDouble() * 4 - 2))
    val out = run(vecs, dims)
    // reference: same integer pipeline in plain Scala
    val milli = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x * 1000)).toArray
    }.toMap
    val mn = (0 until dims).map(i => milli.values.map(_(i)).min)
    val sp = (0 until dims).map(i => math.max(1L, milli.values.map(_(i)).max - mn(i)))
    milli.foreach { case (id, v) =>
      val d = (0 until dims).map(i => v(i) - mn(i))
      val cds = (0 until dims).map(i => d(i) * 255 / sp(i))
      val err = (0 until dims).map(i => math.abs(d(i) - cds(i) * sp(i) / 255)).sum
      assert(out(id)._1 == cds.mkString(","), s"codes for $id")
      assert(out(id)._2 == err, s"err for $id: ${out(id)._2} vs $err")
    }
    // ragged vectors are dropped up front, not half-calibrated
    val ragged = vecs :+ (999L -> Seq(1.0, 2.0))
    assert(!run(ragged, dims).contains(999L))
    // and calibration over the ragged input matches the clean one (the
    // ragged row was excluded BEFORE per-dim stats)
    assert(run(ragged, dims) === out)
  }
}
