package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join: each left row picks the single latest right row
  * with `rightTs <= leftTs` on the same key — the point-in-time-correct
  * lookup a feature-store / training-data pipeline needs (label events
  * joined to the feature state that was current WHEN the event happened,
  * never to future state). Spark has no native ASOF join; DuckDB's
  * `ASOF JOIN` is the oracle for it.
  *
  * Spark-first shape: instead of a range join (O(|left|·|right|) candidate
  * explosion per key before picking the max) the two sides are tagged and
  * UNIONed, then ONE window pass per key ordered by (ts, side) carries the
  * last-seen right payload forward — a single shuffle on the key, O(1)
  * running state per row, no candidate blowup under timestamp skew. Right
  * rows sort BEFORE left rows on timestamp ties, so a right row at exactly
  * `leftTs` is visible (inclusive `<=`, matching DuckDB `ON l.ts >= r.ts`).
  */
object AsOf {

  /** Output: every `left` column, plus each non-key right column as
    * `asof_<name>` (null when no right row is at-or-before the left row).
    * `right` must be unique per (keys, rightTs) — pre-aggregate upstream
    * (e.g. `max_by`) — otherwise "the" as-of row is ambiguous. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val rightVals = right.columns.toIndexedSeq.filterNot(keys.contains)
    val rStructType = StructType(rightVals.map(right.schema(_)))
    val lStructType = StructType(left.columns.map(left.schema(_)))

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ats"), lit(1).as("_side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow"),
        lit(null).cast(rStructType).as("_rrow")): _*)
    // A NULL right timestamp can never be "at or before" anything (SQL
    // comparison semantics — the oracle's `l.ts >= r.ts` is never true for
    // NULL r.ts), but the window's nulls-first ordering would make such a
    // row the earliest state and hand it to every left row. Drop them.
    // Likewise NULL KEYS: SQL equality never matches NULL = NULL, but
    // Window.partitionBy groups NULL keys into one partition, so a NULL-key
    // right row would feed state to NULL-key left rows. Drop those too
    // (left NULL-key rows stay, with asof_* = null — join semantics).
    val rightNonNull = keys.map(col(_).isNotNull).reduceOption(_ && _)
      .map(cond => right.filter(cond)).getOrElse(right)
    val r = rightNonNull.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ats"), lit(0).as("_side"),
        lit(null).cast(lStructType).as("_lrow"),
        struct(rightVals.map(col): _*).as("_rrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*") +:
        rightVals.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
