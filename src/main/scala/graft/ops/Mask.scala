package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-mask projection, changed-column detection and the change-table
  * outer join — the column-level CDC semantics of the reference.
  *
  * Ref: Source/SQL/02-stored-procedure.sqlserver.column.sql:85-124,
  * 02-stored-procedure.postgres.column.sql:19-45,81-133,
  * 02-stored-procedure.sqlserver.table.sql:44-50.
  */
object Mask {

  /** P4/P5 — emit a payload column only when the row is an insert, the mask
    * is unknown (pre-column-tracking row, `changed IS NULL`), or the column
    * is named in the mask:
    * `CASE WHEN op='I' OR changed IS NULL OR 'Col' = ANY(changed) THEN col END`
    * (02-stored-procedure.postgres.column.sql:81-102). */
  def maskedColumn(op: Column, changed: Column, name: String, value: Column): Column =
    when(op === "I" || changed.isNull || array_contains(changed, name), value)

  /** P4/P5 — apply the mask to a set of payload columns and drop no-op
    * updates (`U` rows whose mask is present but empty — the reference
    * suppresses them, 02-stored-procedure.postgres.column.sql:40-44). */
  def maskProjection(changes: DataFrame, payloadCols: Seq[String],
                     opCol: String = "operation", changedCol: String = "changed"): DataFrame = {
    val masked = payloadCols.foldLeft(changes) { (df, c) =>
      df.withColumn(c, maskedColumn(col(opCol), col(changedCol), c, col(c)))
    }
    masked.filter(
      col(opCol) =!= "U" || col(changedCol).isNull || size(col(changedCol)) > 0)
  }

  /** P6/J2 — changed-column detection from old/new row images: per column,
    * `NEW.x IS DISTINCT FROM OLD.x` accumulates the column name into the
    * mask (02-stored-procedure.postgres.column.sql:19-45). Spark's null-safe
    * equal `<=>` is exactly `IS NOT DISTINCT FROM`. */
  def changedMask(oldNew: Seq[(String, Column, Column)]): Column =
    filter(
      array(oldNew.map { case (name, o, n) => when(!(o <=> n), lit(name)) }: _*),
      _.isNotNull)

  /** P6 applied over a log of row versions: old image = previous version of
    * the same key (window `lag`). No-op updates (empty mask) are suppressed.
    * The window shuffles once on the key — at scale this is the same
    * hash-partition the downstream per-key fold reuses. */
  def detectChanges(rows: DataFrame, keyCol: String, orderCol: String,
                    payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val withOld = payloadCols.foldLeft(rows) { (df, c) =>
      df.withColumn(s"_old_$c", lag(col(c), 1).over(w))
    }
    val mask = changedMask(payloadCols.map(c => (c, col(s"_old_$c"), col(c))))
    withOld
      .withColumn("_rn", row_number().over(w))
      .withColumn("changed", when(col("_rn") > 1, mask))
      .withColumn("operation", when(col("_rn") === 1, "I").otherwise("U"))
      .filter(col("operation") =!= "U" || size(col("changed")) > 0)
      .drop(payloadCols.map(c => s"_old_$c") :+ "_rn": _*)
  }

  /** A4 — the mask rendered as the reference's quoted JSON-array string
    * (`STRING_AGG(name, '","')` wrapped in `["…"]`,
    * 02-stored-procedure.sqlserver.column.sql:85-93). */
  def maskAsJsonArray(changed: Column): Column =
    when(changed.isNull, lit(null).cast("string"))
      .when(size(changed) === 0, lit("[]"))
      .otherwise(concat(lit("[\""), array_join(changed, "\",\""), lit("\"]")))

  /** J1 — change-table outer join: changes side preserved so deletes (base
    * row already gone) survive with a NULL payload.
    * Ref: 02-stored-procedure.sqlserver.table.sql:44-50.
    *
    * Equi-join on the key; at scale Catalyst picks sort-merge or
    * broadcast-hash depending on the base-side stats — the changes side is
    * one polling cycle and is usually the small, broadcastable one. */
  def changeOuterJoin(changes: DataFrame, base: DataFrame, key: String): DataFrame =
    changes.join(base, Seq(key), "left_outer")
}
