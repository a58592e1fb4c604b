package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch numbering, cumulative-size cleanup and the simple ordered reads.
  * Ref: Source/Services/ExportService.cs:106-124,333-361; Program.cs:707-823.
  */
object Windows {

  /** W2 — split a batch into HTTP sub-batches of `n` records: batch index
    * `floor((rn-1)/n)`, plus the total-batches header value. The window is
    * partitioned per group key (one envelope = one tracked object's cycle),
    * so numbering never serializes across objects.
    * Ref: ExportService.cs:106-124. */
  def numberBatches(rows: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    rows
      .withColumn("batch",
        floor((row_number().over(w) - 1) / n).cast("int"))
      .withColumn("total_batches",
        ceil(count(lit(1)).over(Window.partitionBy(col(groupCol))) / lit(n.toDouble)).cast("int"))
  }

  /** A8/W3/O5 — size-capped directory cleanup: keep newest files whose
    * cumulative size fits the cap, delete the rest oldest-first.
    * Ref: ExportService.cs:333-361 (cap Environment.cs:62-63). */
  def cleanupPlan(files: DataFrame, capBytes: Long): DataFrame = {
    val w = Window.partitionBy(col("env"))
      .orderBy(col("day").desc, col("file_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cumulative_bytes", sum(col("size_bytes")).over(w))
      .withColumn("delete", col("cumulative_bytes") > capBytes)
  }

  /** O1..O6 — ordered-limit reads share one shape: deterministic sort with a
    * unique tie-break + limit (Spark executes as TakeOrderedAndProject — a
    * per-partition top-k then a k-row merge, no global sort). */
  def topN(df: DataFrame, n: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(n)
}
