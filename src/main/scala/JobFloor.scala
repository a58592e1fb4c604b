import org.apache.spark.sql.functions._

/** Measures the irreducible per-query floor: a trivial noop write under the
  * small-query confs, 30 reps — pure scheduler/task-launch/commit cost with
  * no data and no distinct-plan first-touch work. This number bounds what
  * ANY per-query optimization can achieve on the control-class bench
  * queries (BENCHNOTES round-8: 44 ms one stage, 74 ms with a shuffle). */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.Harness.session("32")
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    spark.range(10).write.format("noop").mode("overwrite").save()
    for (variant <- Seq("plain-1part", "shuffle-2part")) {
      val t0 = System.nanoTime()
      for (i <- 1 to 30) {
        val df = if (variant == "plain-1part") spark.range(10).select(col("id"))
                 else spark.range(10).groupBy(col("id") % 3).agg(count(lit(1)))
        graft.runtime.ExecPolicy.runForced(df)(_.write.format("noop").mode("overwrite").save())
      }
      println(f"[floor] $variant%-14s ${(System.nanoTime()-t0)/1e6/30}%7.1f ms/query")
    }
    spark.stop()
  }
}
