package graft
import org.apache.spark.sql.functions._
import graft.ops.Similarity
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session("4")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    emb.count()
    val keyed = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), Similarity.lshKeyQ(col("qv"), 12, 64).as("bucket"))
    val a = keyed.select(col("bucket"), col("vec_id").as("id_a"))
    val b = keyed.select(col("bucket"), col("vec_id").as("id_b"))
    val joined = a.join(b.hint("broadcast"), Seq("bucket")).filter(col("id_a") < col("id_b"))
    val t0 = System.nanoTime()
    joined.count()
    println(f"[probe] join count took ${(System.nanoTime()-t0)/1e9}%.2f s")
    val ep = joined.queryExecution.executedPlan
    println("[plan-start]")
    println(ep.toString.take(3000))
    println("[metrics]")
    def dump(p: org.apache.spark.sql.execution.SparkPlan, d: Int = 0): Unit = {
      val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
      println(("  " * d) + p.nodeName + "  " + m.take(200))
      p match {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => dump(ad.executedPlan, d+1)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => dump(qs.plan, d+1)
        case rd: org.apache.spark.sql.execution.InputAdapter => dump(rd.child, d+1)
        case wc: org.apache.spark.sql.execution.WholeStageCodegenExec => dump(wc.child, d+1)
        case _ => p.children.foreach(dump(_, d+1))
      }
    }
    dump(ep)
    spark.stop()
  }
}
