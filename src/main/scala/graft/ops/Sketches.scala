package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching over grouped data (the cardinality probe a
  * 100 TB profiling pass runs per column/group without holding distinct
  * sets). Built on the native [[graft.expressions.KmvMins]] aggregate —
  * bounded k-long state per group, map-side partial aggregation, and a
  * deterministic sha-derived hash so the estimate is engine-portable
  * (unlike HLL, whose registers are engine-private). */
object Sketches {

  /** KMV estimate scale: hashes are uniform in [0, 2^60) (DedupOps.hash60). */
  val HashSpaceLong: Long = 1L << 60

  /** The KMV distinct estimate over a bottom-k mins array column — exact
    * below saturation (the sketch IS the set), else the (k−1)·2⁶⁰/kth-min
    * estimator computed DIVISION-FIRST in int64 with a floor-1 divisor
    * guard (round-10 rule d: the product form overflows at k=256, float
    * is inexact above 2⁵³). ONE definition for every KMV surface
    * (kmvDistinct, UrlOps.domainRollup, StreamingStats.snapshot — the r15
    * review found the expression triplicated); the oracles replay the
    * same arithmetic in SQL. */
  def kmvEstimate(minsCol: String, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col(minsCol)) < k,
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.col(minsCol)).cast("long"))
      .otherwise(org.apache.spark.sql.functions.expr(
        s"${HashSpaceLong}L div greatest(element_at($minsCol, $k) div ${k - 1}, 1L)"))

  /** Count-Min sketch over `hashCol` (a [[DedupOps.hash60]] hash of the
    * counted value): one row per group with the `depth·width` counter grid.
    * Point estimates read the grid with [[cmsEstimate]]. `weightCol` (r18)
    * adds each row's weight instead of 1 — bit-identical to replaying the
    * row weight times, so a (value, count) pre-aggregate can feed the grid
    * at vocabulary scale instead of occurrence scale. */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], hashCol: Column,
                depth: Int = 4, width: Int = 512,
                weightCol: Option[Column] = None): DataFrame = {
    val keyed = df.select(
      (groupCols.map(col) :+ hashCol.as("_h")) ++
        weightCol.map(_.as("_w")).toSeq: _*)
    val aggExpr = weightCol match {
      case None => expr(s"cms_counts(_h, $depth, $width)").as("cms")
      case Some(_) => expr(s"cms_counts(_h, $depth, $width, _w)").as("cms")
    }
    if (groupCols.isEmpty) keyed.agg(aggExpr)
    else keyed.groupBy(groupCols.map(col): _*).agg(aggExpr)
  }

  /** Min-over-depths point estimate for a value's hash against a CMS grid
    * column — the same integer permutation family the aggregate uses, so
    * this is exactly the counter each depth row incremented. */
  def cmsEstimate(hashCol: Column, cms: Column, depth: Int = 4,
                  width: Int = 512): Column = {
    val P = DedupOps.MersennePrime31
    val hm = pmod(hashCol, lit(P)) // mirror the aggregate's floorMod
    val cells = (0 until depth).map { d =>
      val bucket = pmod(lit(2L * d + 3) * hm + lit(12289L * (d + 1)), lit(P)) % width
      element_at(cms, (lit(d.toLong * width) + bucket + 1L).cast("int"))
    }
    least(cells: _*)
  }

  /** Per-group top-k of DISTINCT (score, id) pairs via the bounded-state
    * native aggregate — the scale-correct form of `row_number() <= k`:
    * the shuffle carries at most k pairs per (partition, group) instead of
    * sorting every row of every group. Returns one row per kept pair with
    * a 1-based rank (score DESC, id ASC). */
  def topK(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
           idCol: Column, k: Int): DataFrame = {
    require(k >= 1, "topK k must be >= 1")
    val agged = df
      .select(groupCols.map(col) :+ scoreCol.cast("long").as("_s")
        :+ idCol.cast("long").as("_i"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"topk_pairs(_s, _i, $k)").as("_top"))
    agged
      .select(groupCols.map(col) :+ posexplode(col("_top")).as(Seq("_pos", "_p")): _*)
      .select(groupCols.map(col)
        :+ (col("_pos") + 1).cast("long").as("rank")
        :+ col("_p.score").as("score")
        :+ col("_p.id").as("id"): _*)
  }

  /** Distinct-count estimate per group: exact when a group has fewer than
    * `k` distinct values (the sketch IS the set), else the KMV estimator
    * `(k-1) * 2^60 / kth_min` computed DIVISION-FIRST in int64 —
    * `2^60 div (kth div (k-1))` with a floor-1 guard on the inner div
    * (round-10 rule d: the product form overflows int64 at k = 256, and
    * the all-integer form keeps the estimate float-free end to end; same
    * form as [[graft.streaming.StreamingStats.snapshot]]). `hashCol` must
    * be a deterministic uniform 60-bit hash of the counted value (use
    * [[DedupOps.hash60]]). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], hashCol: Column,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "kmv k must be >= 2")
    val grouped = df
      .select(groupCols.map(col) :+ hashCol.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"kmv_mins(_h, $k)").as("_mins"))
    grouped
      .withColumn("n_mins", size(col("_mins")))
      .withColumn("distinct_est", kmvEstimate("_mins", k))
      .drop("_mins")
  }

  /** Quantile estimates from a DETERMINISTIC uniform sample: keep the `k`
    * rows with the smallest content-addressed hash priority (bottom-k by
    * hash — the same min-k trick as KMV, here carrying the value as the
    * [[graft.expressions.TopKPairsTagged]] payload), sort the sample once
    * IN AN ARRAY (k elements, never a corpus ORDER BY), and read each
    * quantile off by rank selection `ceil(q·n/100)`.
    *
    * Properties: mergeable (min-k of a union is the min-k of min-ks, the
    * aggregate's own combine), rerun/engine/topology-stable membership
    * (hash priorities), sampling error O(1/√k), and — unlike KLL/GK
    * compaction — every step is integer-deterministic, so the estimate is
    * oracle-checkable EXACTLY, not just within a rank-error bound. State
    * is k triples per partition at every stage. Groups smaller than `k`
    * degrade to the exact quantiles of the full group. */
  def quantileSample(df: DataFrame, valueCol: Column, idCol: Column,
                     quantiles: Seq[Int], k: Int = 256,
                     salt: String = "qs"): DataFrame = {
    require(k >= 2, "quantileSample k must be >= 2")
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 1 && q <= 100),
      "quantiles must be percentages in [1, 100]")
    val pri = -DedupOps.hash60(concat(lit(salt + ":"), idCol.cast("string")))
    df.select(pri.as("_pri"), idCol.cast("long").as("_i"),
        valueCol.cast("long").as("_v"))
      .agg(expr(s"topk_pairs_tag(_pri, _i, _v, $k)").as("_top"))
      .select(array_sort(transform(col("_top"),
        p => struct(p.getField("tag").as("v"), p.getField("id").as("id")))).as("_sv"))
      .select(col("_sv"), size(col("_sv")).cast("long").as("sample_n"),
        explode(array(quantiles.map(q => lit(q)): _*)).as("q"))
      .select(col("q").cast("long").as("q"),
        element_at(col("_sv"),
          greatest(lit(1), ceil(col("q") * col("sample_n") / 100.0)).cast("int"))
          .getField("v").as("value"),
        col("sample_n"))
  }
}
