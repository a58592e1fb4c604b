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
}
