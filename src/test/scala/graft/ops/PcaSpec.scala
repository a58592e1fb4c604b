package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gram_matrix equals the brute-force sum of outer products") {
    val vecs = Seq(Seq(1L, 2L, 3L), Seq(-4L, 0L, 5L), Seq(2L, 2L, 2L))
    val g = vecs.map(Tuple1(_)).toDF("q")
      .agg(expr("gram_matrix(q, 3)")).head().getSeq[Long](0)
    val exp = Array.ofDim[Long](9)
    for (v <- vecs; i <- 0 until 3; j <- 0 until 3) exp(i * 3 + j) += v(i) * v(j)
    assert(g == exp.toSeq)
  }

  test("gram_matrix skips NULL and ragged rows, partial-merges across partitions") {
    val df = Seq(
      Some(Seq(2L, 3L)), None, Some(Seq(1L)), // ragged 1-element row skipped
      Some(Seq(-1L, 4L))
    ).toDF("q").repartition(3)
    val g = df.agg(expr("gram_matrix(q, 2)")).head().getSeq[Long](0)
    // rows (2,3) and (-1,4): [[4+1, 6-4], [6-4, 9+16]]
    assert(g == Seq(5L, 2L, 2L, 25L))
  }

  test("powerIteration recovers a planted dominant axis") {
    val rnd = new scala.util.Random(42L)
    val dim = 8
    val rows = (1 to 200).map { _ =>
      val v = Array.fill(dim)((rnd.nextFloat() - 0.5f) * 0.2f)
      v(5) = 2.0f + rnd.nextFloat() // planted heavy positive axis 5
      Tuple1(v.toSeq)
    }
    val out = Pca.powerIteration(rows.toDF("embedding"), "embedding", dim,
        quantScale = 1000L, rounds = 5)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(out.length == dim)
    val maxIdx = out.indices.maxBy(i => math.abs(out(i)))
    assert(maxIdx == 5, s"dominant axis should be 5, got $maxIdx in ${out.toSeq}")
    assert(out(5) > 0L, "all-ones start + positive axis → positive component")
    assert(math.abs(out(5)) > 5L * out.indices.filter(_ != 5).map(i => math.abs(out(i))).max,
      "planted axis dominates the noise axes decisively")
  }

  test("powerIteration is deterministic across runs and partitionings") {
    val rows = (1 to 100).map { i =>
      Tuple1(Seq.tabulate(4)(j => ((i * 31 + j * 7) % 13 - 6) / 10.0f))
    }
    val a = Pca.powerIteration(rows.toDF("embedding").repartition(2), "embedding", 4)
      .as[(Int, Long)].collect().toSeq.sorted
    val b = Pca.powerIteration(rows.toDF("embedding").repartition(7), "embedding", 4)
      .as[(Int, Long)].collect().toSeq.sorted
    assert(a == b, "integer Gram + integer iteration must not depend on partitioning")
  }

  test("spectralHistogram matches a driver-side replay of quantize+dot+bucket") {
    val rnd = new scala.util.Random(99L)
    val dim = 8
    val rows = (1 to 150).map { _ =>
      val v = Array.fill(dim)((rnd.nextFloat() - 0.5f) * 0.4f)
      v(2) = 1.5f + rnd.nextFloat()
      Tuple1(v.toSeq)
    }
    val df = rows.toDF("embedding")
    val width = 1L << 12
    val got = Pca.spectralHistogram(df, "embedding", dim, 1000L, 5, width)
      .as[(Long, Long, Long, Long)].collect().toSet

    val ev = Pca.dominantEigenvector(df, "embedding", dim, 1000L, 5).get
    val projs = rows.map { r =>
      r._1.zip(ev).map { case (x, vi) =>
        math.floor(x.toDouble * 1000).toLong * vi
      }.sum
    }
    val expected = projs.groupBy(_ / width).map { case (b, ps) =>
      (b, ps.size.toLong, ps.min, ps.max)
    }.toSet
    assert(got == expected)
    assert(got.toSeq.map(_._2).sum == rows.size.toLong, "every vector lands in a bucket")
  }

  test("empty corpus yields ZERO rows (oracle parity), not a crash") {
    val out = Pca.powerIteration(
        Seq.empty[Tuple1[Seq[Float]]].toDF("embedding"), "embedding", 4)
      .as[(Int, Long)].collect().toSeq
    assert(out.isEmpty, "the DuckDB CTE chain yields zero rows on an empty corpus")
    val hist = Pca.spectralHistogram(
        Seq.empty[Tuple1[Seq[Float]]].toDF("embedding"), "embedding", 4)
      .collect()
    assert(hist.isEmpty)
  }

  test("ragged rows are excluded from BOTH the Gram and the projection pass") {
    val rows = Seq(
      Tuple1(Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      Tuple1(Seq(1.0f, 2.0f)), // ragged — must not contribute a partial dot
      Tuple1(Seq(1.0f, 2.0f, 3.0f, 4.0f)))
    val df = rows.toDF("embedding")
    val clean = Seq(rows(0), rows(2)).toDF("embedding")
    val a = Pca.spectralHistogram(df, "embedding", 4, 1000L, 5, 1L << 12)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Pca.spectralHistogram(clean, "embedding", 4, 1000L, 5, 1L << 12)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b, "a short vector must neither skew the spectrum nor NULL a bucket")
  }

  test("null-ELEMENT rows are excluded from the Gram normalizer n, not just the aggregate") {
    // Round-11 advice: GramMatrix skips a dim-length vector containing a
    // NULL element in-aggregate, so counting it in n would dilute G/n.
    // The eigenvector over (clean + nully) must equal the eigenvector
    // over clean alone — i.e. n and G see the same row set.
    val clean = (1 to 50).map { i =>
      Tuple1(Seq.tabulate(4)(j => Option(((i * 31 + j * 7) % 13 - 6) / 10.0f)))
    }
    val nully = Tuple1(Seq(Some(9.9f), None, Some(9.9f), Some(9.9f)))
    val a = Pca.powerIteration((clean :+ nully).toDF("embedding"), "embedding", 4)
      .as[(Int, Long)].collect().toSeq.sorted
    val b = Pca.powerIteration(clean.toDF("embedding"), "embedding", 4)
      .as[(Int, Long)].collect().toSeq.sorted
    assert(a == b, "a null-element row must not be counted in the normalizer")
  }
}
