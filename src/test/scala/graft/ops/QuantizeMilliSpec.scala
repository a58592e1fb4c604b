package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native quantize_milli kernel must reproduce the HOF reference form
  * `transform(vec, x -> cast(round(x * 1000) as long))` bit-for-bit under
  * the session's ANSI defaults — DOUBLE-promoted multiply, HALF_UP round
  * via the same BigDecimal operation, ANSI-throwing double→long cast,
  * element-null propagation. */
class QuantizeMilliSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[Seq[java.lang.Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))

  private def compare(rows: Seq[Seq[java.lang.Float]]): Unit =
    df(rows).select(col("id"),
        Similarity.quantize(col("vec")).as("q"),
        Similarity.quantizeHof(col("vec")).as("ref"))
      .collect()
      .foreach { r =>
        assert(r.get(1) == r.get(2), s"id=${r.getLong(0)}: ${r.get(1)} != ${r.get(2)}")
      }

  test("kernel == HOF reference on adversarial finite values") {
    def f(x: Double) = java.lang.Float.valueOf(x.toFloat)
    compare(Seq(
      Seq(f(0.0), f(-0.0), f(0.0004), f(0.0005), f(0.0006), f(-0.0005)),
      Seq(f(0.0015), f(-0.0015), f(0.0025), f(-0.0025), f(1.0005), f(-1.0005)),
      Seq(f(0.0115), f(-0.0115), f(0.4999999), f(-0.4999999), f(0.49999997)),
      // large but in-range after ×1000: float→double is exact, round is identity
      Seq(f(1.6777216e7), f(1.6777217e7), f(9.2e12), f(1e15), f(-1e15)),
      Seq(null, f(1.5), null),
      Seq()
    ))
  }

  test("kernel throws where the ANSI reference throws (NaN / overflow)") {
    def boom(rows: Seq[Seq[java.lang.Float]], c: org.apache.spark.sql.Column) =
      intercept[Exception] { df(rows).select(c).collect() }
    val nan = Seq(Seq(java.lang.Float.valueOf(java.lang.Float.NaN)))
    val huge = Seq(Seq(java.lang.Float.valueOf(3.4e38f))) // ×1000 > Long range
    boom(nan, Similarity.quantizeHof(col("vec")))
    boom(nan, Similarity.quantize(col("vec")))
    boom(huge, Similarity.quantizeHof(col("vec")))
    boom(huge, Similarity.quantize(col("vec")))
  }

  test("kernel == HOF reference on the real embeddings corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = emb.select(
        Similarity.quantize(col("embedding")).as("q"),
        Similarity.quantizeHof(col("embedding")).as("ref"))
      .filter(not(col("q") <=> col("ref")))
      .count()
    assert(bad == 0L)
  }

  test("pseudo-random finite float sweep (deterministic, 64k values)") {
    // Bit-patterned floats across the exponent range, built WITHOUT
    // Math.random; NaN/Inf and |x*1000| beyond long range are excluded
    // (they throw — previous test) via a finite-product filter.
    val raw = spark.range(65536).select(
      expr("java_method('java.lang.Float', 'intBitsToFloat', " +
        "cast((id * 2654435761) % 4294967296 - 2147483648 as int))").as("x"))
      .filter(expr("NOT isnan(x) AND NOT x IN (double('Infinity'), double('-Infinity'))"))
      .filter(expr("abs(cast(x as double) * 1000.0) < 9.0e18"))
      .select(expr("array(x)").cast("array<float>").as("vec"))
    val bad = raw.select(
        Similarity.quantize(col("vec")).as("q"),
        Similarity.quantizeHof(col("vec")).as("ref"))
      .filter(not(col("q") <=> col("ref")))
      .count()
    assert(bad == 0L)
  }
}
