package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Similarity.meanPool]]: exact integer per-dimension means
  * (including truncation-toward-zero on negative sums — the DuckDB `//`
  * semantics the oracle relies on) and the bounded-state aggregation plan
  * (partial collect_list merge below the exchange). */
class MeanPoolSpec extends SparkSpec {
  import spark.implicits._

  test("meanPool: exact integer means, negative sums truncate toward zero") {
    // quantized: [1500, -3500], [2500, -2500], [999, 1]
    val emb = Seq(
      (0L, Seq(1.5f, -3.5f)),
      (1L, Seq(2.5f, -2.5f)),
      (2L, Seq(0.999f, 0.001f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.meanPool(emb, expr("vec_id div 2"), dim = 2)
      .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    // group 0: sums (4000, -6000) over 2 -> (2000, -3000)
    assert(got(0L) == ((0L, 2L, Seq(2000L, -3000L))))
    // group 1: single vector passes through exactly
    assert(got(1L) == ((1L, 1L, Seq(999L, 1L))))
    // negative truncation: sums (-7, -6)? construct explicitly
    val odd = Seq((0L, Seq(-0.003f)), (1L, Seq(-0.004f))).toDF("vec_id", "embedding")
    val m = Similarity.meanPool(odd, lit(0L), dim = 1)
      .as[(Long, Long, Seq[Long])].head()
    // quantized -3 + -4 = -7; -7 div 2 = -3 (toward zero), NOT floor -4
    assert(m == ((0L, 2L, Seq(-3L))))
  }

  test("meanPool plan: partial (map-side) list merge below the exchange") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Partial}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val emb = Seq((0L, Seq(1.0f)), (1L, Seq(2.0f))).toDF("vec_id", "embedding")
    val phys = Similarity.meanPool(emb, expr("vec_id div 2"), dim = 1)
      .queryExecution.sparkPlan
    val aggs = phys.collect { case a: BaseAggregateExec => a }
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode == Partial)),
      "collect_list must merge partially map-side")
    assert(!aggs.exists(_.aggregateExpressions.exists(_.mode == Complete)),
      "no Complete-mode aggregate — raw vectors must not all ship to one level")
  }
}
