package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning: data written partitioned by a low-cardinality column
  * must let a filter on that column skip whole directories — at 100 TB this
  * is the difference between scanning a day and scanning a decade. The spec
  * pins both the plan (PartitionFilters present) and the physical effect
  * (fewer files actually read). */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned writes prune to the filtered partitions only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pruning").toString
    val rows = (1 to 300).map { i =>
      (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", s"payload$i")
    }.toDF("id", "day", "payload")
    rows.repartition(col("day")).write.partitionBy("day").parquet(s"$dir/t")

    val all = spark.read.parquet(s"$dir/t")
    val pruned = all.filter(col("day") === "2024-01-03")

    // plan: the day predicate must land in PartitionFilters, not a
    // post-scan Filter over all partitions
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-03"),
      s"day filter did not reach PartitionFilters:\n$scan")

    // physical effect: only the one partition's files are read. inputFiles
    // reports the whole relation, so read the scan's own numFiles metric
    // after executing this exact plan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    assert(pruned.queryExecution.toRdd.count() == 30)
    val scanExec = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    val filesRead = scanExec.metrics("numFiles").value
    val filesTotal = all.inputFiles.length
    assert(filesRead < filesTotal && filesRead >= 1,
      s"pruning read $filesRead of $filesTotal files")
  }

  test("min/max row-group statistics prune a selective id predicate's scan output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    (1L to 10000L).toDF("id").withColumn("payload", concat(lit("p"), col("id")))
      .orderBy("id") // clustered on id → tight per-file min/max
      .write.parquet(s"$dir/t")
    val pruned = spark.read.parquet(s"$dir/t").filter(col("id") === 12345L)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("12345"),
      s"id predicate not pushed to the parquet reader:\n$scan")
    assert(pruned.count() == 0)
  }
}
