package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers for hot keys at scale.
  *
  * AQE handles skewed JOINS automatically; skewed AGGREGATIONS over
  * algebraic functions are handled here by salting: a two-phase aggregate
  * where phase 1 spreads each hot key over `buckets` salted sub-keys and
  * phase 2 merges the partials. Deterministic salt (hash of a tiebreak
  * column) so results and tests are stable.
  */
object Skew {

  /** Two-phase salted sum/count/min/max aggregation.
    *
    * `partials` maps output column name → (phase-1 agg over the raw column,
    * phase-2 merge over the partial). E.g. count: (count(c), sum(partial));
    * sum: (sum(c), sum(partial)); max: (max(c), max(partial)).
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltSource: Column,
      buckets: Int,
      partials: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(
        partials.head._2._1.as(s"_p_${partials.head._1}"),
        partials.tail.map { case (n, (agg, _)) => agg.as(s"_p_$n") }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        partials.head._2._2(col(s"_p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map { case (n, (_, merge)) => merge(col(s"_p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted count per key — the common hot-key case. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltSource: Column,
                  buckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, saltSource, buckets,
      Map("cnt" -> (count(lit(1)), (p: Column) => sum(p))))
}
