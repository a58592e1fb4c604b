package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stable sample: deterministic, and appending data never changes membership") {
    val base = (1L to 1000L).toDF("id")
    val s1 = Sampling.stableSample(base, "id", 300).select($"id").as[Long].collect().toSet
    val s2 = Sampling.stableSample(base, "id", 300).select($"id").as[Long].collect().toSet
    assert(s1 == s2, "same data → same sample")
    // grow the table: previously sampled ids must all still be sampled
    val grown = (1L to 2000L).toDF("id")
    val s3 = Sampling.stableSample(grown, "id", 300).select($"id").as[Long].collect().toSet
    assert(s1.subsetOf(s3), "membership is content-addressed, not positional")
    // and the rate is roughly right
    assert(math.abs(s1.size - 300.0) / 300.0 < 0.25, s"rate off: ${s1.size}/1000 vs 30%")
  }

  test("train/test split: labels partition the data and use an independent hash") {
    val df = Sampling.trainTestSplit((1L to 1000L).toDF("id"), "id",
      testPermille = 100, valPermille = 50)
    val counts = df.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000)
    assert(counts("test") > 50 && counts("test") < 160)
    assert(counts("val") > 20 && counts("val") < 90)
    // independence from the sample hash: the test rows are not the rows a
    // stableSample with the same permille would pick
    val testIds = df.filter($"split" === "test").select($"id").as[Long].collect().toSet
    val sampleIds = Sampling.stableSample((1L to 1000L).toDF("id"), "id", 100)
      .select($"id").as[Long].collect().toSet
    assert(testIds != sampleIds, "salts must decouple the two decisions")
  }

  test("stratifiedQuotaBounded is row-identical to the window shape on " +
    "randomized skewed data (bounded aggregate ≡ row_number draw)") {
    val rnd = new scala.util.Random(59)
    // skewed: stratum s0 holds ~half the rows, the rest spread over 9
    val rows = (1 to 800).map { _ =>
      val st = if (rnd.nextBoolean()) "s0" else s"s${1 + rnd.nextInt(9)}"
      (st, math.abs(rnd.nextLong()) % 1000000L)
    }.distinct
    val df = rows.toDF("stratum", "id")
    def collectDraw(d: org.apache.spark.sql.DataFrame) =
      d.select($"stratum", $"id", $"draw_rank").as[(String, Long, Int)].collect().toSet
    val windowDraw = collectDraw(Sampling.stratifiedQuota(df, "stratum", "id", 25))
    val boundedDraw = collectDraw(Sampling.stratifiedQuotaBounded(df, "stratum", "id", 25))
    assert(boundedDraw === windowDraw)
    // caller columns survive the broadcast join-back
    val extra = Sampling.stratifiedQuotaBounded(
      df.withColumn("payload", $"id" * 2), "stratum", "id", 5)
    assert(extra.columns.toSet ===
      Set("stratum", "id", "payload", "draw_rank"))
    assert(extra.filter($"payload" =!= $"id" * 2).count() === 0)
  }

  test("isqrt: exact on randomized inputs, perfect squares, and ±1 boundaries") {
    val rnd = new scala.util.Random(13)
    // adversarial set: perfect squares r², r²±1 (where the double seed is
    // most likely to land on the wrong side), plus uniform draws across
    // magnitudes up to the 2⁵² documentation bound
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L) ++
      (1 to 200).flatMap { _ =>
        val r = math.abs(rnd.nextLong()) % 60000000L
        Seq(r * r - 1, r * r, r * r + 1).filter(_ >= 0)
      } ++
      (1 to 200).map(_ => math.abs(rnd.nextLong()) % (1L << 52))
    val df = cases.toDF("n").select($"n", Sampling.isqrt($"n").as("r"))
    df.collect().foreach { row =>
      val (n, r) = (row.getLong(0), row.getLong(1))
      val expect = java.math.BigInteger.valueOf(n).sqrt().longValue()
      assert(r == expect, s"isqrt($n) = $r, want $expect")
    }
  }

  test("stratified quota: exactly n per stratum, deterministic draw") {
    val df = (1L to 500L).map(i => (s"s${i % 4}", i)).toDF("stratum", "id")
    val q = Sampling.stratifiedQuota(df, "stratum", "id", 30)
    val counts = q.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(30L), s"every stratum capped at 30: $counts")
    val draw1 = q.select($"id").as[Long].collect().toSet
    val draw2 = Sampling.stratifiedQuota(df, "stratum", "id", 30)
      .select($"id").as[Long].collect().toSet
    assert(draw1 == draw2, "the draw is deterministic")
    // rank is 1..n within each stratum
    val ranks = q.filter($"stratum" === "s0").select($"draw_rank").as[Int].collect().sorted
    assert(ranks.toSeq == (1 to 30))
  }
}
