package graft

object TierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq())
    val spark = Harness.session("8")
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t2 = graft.runtime.ExecPolicy.isSmall(df)
        val t1 = graft.runtime.ExecPolicy.isSmallInputNonIterative(df)
        val hasRdd = {
          val p = df.queryExecution.optimizedPlan
          (p +: p.subqueriesAll).exists(_.exists(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
        }
        println(s"TIER $n tier2=$t2 tier1=$t1 logicalRdd=$hasRdd")
      } catch { case e: Throwable => println(s"TIER $n ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
