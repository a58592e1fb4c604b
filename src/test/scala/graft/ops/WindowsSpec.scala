package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed single-group batch numbering must agree exactly with
  * the W2 window form it replaces in the relay path. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("numberBatchesRange equals the window form for one group, any partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = rnd.shuffle((1L to 537L).toVector).map(v => ("orders", v, s"p$v"))
      .toDF("g", "version", "payload")
    val viaWindow = Windows.numberBatches(rows, "g", "version", 100)
      .select($"version", $"batch", $"total_batches")
      .as[(Long, Int, Int)].collect().toSet
    val viaRange = Windows.numberBatchesRange(rows.repartition(7), "version", 100, 537L)
      .select($"version", $"batch", $"total_batches")
      .as[(Long, Int, Int)].collect().toSet
    assert(viaRange == viaWindow)
    assert(viaRange.forall(_._3 == 6), "537 rows at 100/batch = 6 batches")
    assert(viaRange.count(_._2 == 5) == 37, "last batch holds the remainder")
  }
}
