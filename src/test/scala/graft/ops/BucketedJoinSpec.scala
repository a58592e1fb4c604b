package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-write co-location: persisting both sides of a recurring join
  * bucketed by the join key lets Spark sort-merge-join them with NO exchange
  * — at 100 TB this turns the nightly fact-to-fact join from a full shuffle
  * of both tables into a local per-bucket merge. This spec pins the plan
  * shape (no ShuffleExchange on either side), not just the row results. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the join key plans no shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (1 to 1000).map(i => (i.toLong % 97, s"l$i")).toDF("k", "lv")
      val right = (1 to 1000).map(i => (i.toLong % 97, s"r$i")).toDF("k", "rv")
      left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/t_left").saveAsTable("graft_bucketed_left")
      right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/t_right").saveAsTable("graft_bucketed_right")

      val joined = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // correctness of the co-located join vs a plain join
      val expected = left.join(right, Seq("k")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }
}
