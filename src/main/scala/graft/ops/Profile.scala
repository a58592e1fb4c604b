package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic dataset profiler: per-column row/null/distinct counts and
  * value range — the standing data-quality report (Great-Expectations
  * class) a pipeline publishes next to every dataset version, and the
  * first thing a new consumer reads before trusting a 100 TB table.
  *
  * Shape: every selected column is cast to its STRING rendering and
  * unpivoted into (column, value) pairs in ONE scan (an explode of a
  * row-local struct array — no per-column re-scan of the table), then a
  * single #cols-bounded aggregation computes the stats. `n_distinct` is
  * exact (the aggregation plans an Expand, cost #cols × corpus — the
  * sketch-based alternative is `Sketches.kmvSketch` when an estimate is
  * enough). Min/max are over the string rendering (binary collation in
  * both engines), so they are display-range semantics, not numeric —
  * exactly what the DuckDB oracle replays with `CAST(c AS VARCHAR)`.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns selected")
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("_p"))
      .select(col("_p.col_name").as("col_name"), col("_p.v").as("v"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  /** Referential-integrity audit for one FK relationship: the child table
    * LEFT-joined to the parent's distinct keys, folded to a single
    * (relation, n_child, n_orphans, orphan_ppm) row. One shuffle on the
    * key (the parent side is the distinct-keys projection — the natural
    * build side; Catalyst broadcasts it when the dimension is small) and
    * a 1-row conditional aggregate; null child keys count as orphans (a
    * null FK cannot resolve). The audit every lakehouse runs before
    * trusting a join. Single-relation form of [[refIntegrityMulti]] (one
    * implementation — review catch). */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   relation: String): DataFrame =
    refIntegrityMulti(child, Seq((childKey, parent, parentKey, relation)))

  /** All FK relations of ONE child (fact) table in a SINGLE scan: chained
    * left joins against each parent's distinct keys, one conditional
    * aggregate, then a 1-row unpivot to per-relation rows. At 100 TB the
    * fact scan dominates — auditing k relations must not cost k scans.
    * `rels` = (childKey, parent, parentKey, relationName). */
  def refIntegrityMulti(child: DataFrame,
      rels: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(rels.nonEmpty, "refIntegrityMulti: no relations")
    val joined = rels.zipWithIndex.foldLeft(
        child.select(rels.map(_._1).distinct.map(col): _*)) {
      case (acc, ((ck, parent, pk, _), i)) =>
        acc.join(parent.select(col(pk).as(s"_pk$i")).distinct(),
          col(ck) === col(s"_pk$i"), "left_outer")
    }
    val orphanAggs = rels.indices.map(i =>
      sum(when(col(s"_pk$i").isNull, 1L).otherwise(0L)).as(s"_o$i"))
    joined
      .agg(count(lit(1)).as("n_child"), orphanAggs: _*)
      .select(explode(array(rels.zipWithIndex.map { case ((_, _, _, rel), i) =>
        struct(lit(rel).as("relation"), col("n_child"),
          col(s"_o$i").as("n_orphans")) }: _*)).as("_r"))
      .select(col("_r.relation").as("relation"),
        col("_r.n_child").as("n_child"), col("_r.n_orphans").as("n_orphans"),
        expr("_r.n_orphans * 1000000 div _r.n_child").as("orphan_ppm"))
  }

  /** Join-key skew audit: per-key occupancy top-k plus global totals — the
    * pre-join probe that decides broadcast vs salt vs AQE skew-split for a
    * key at 100 TB. ONE key-rollup aggregation computes totals AND the
    * top-k in the same pass (the bounded `topk_pairs` native aggregate —
    * k pairs per partition map-side, never a window over every key), so
    * the key table is consumed once and needs no checkpoint. Output: one
    * row per top-k key with rank, count, and mass in ppm of all rows.
    * Keys must be integral (the topk_pairs contract). */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n"))
    counts
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        expr(s"topk_pairs(n, key, $k)").as("_top"))
      .select(col("n_rows"), col("n_keys"),
        posexplode(col("_top")).as(Seq("_pos", "_p")))
      .select(col("n_rows"), col("n_keys"),
        (col("_pos") + 1).cast("long").as("rank"),
        col("_p.id").as("key"), col("_p.score").as("key_rows"),
        expr("_p.score * 1000000 div n_rows").as("mass_ppm"))
  }
}
