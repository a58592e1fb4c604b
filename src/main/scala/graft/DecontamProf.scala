package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnGlue

/** Scratch same-JVM profiler for llm_decontam's cold/warm split (r19 task
  * 2) — not registered. PROF_ORDER=norepart_first flips. */
object DecontamProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    import Prof.t
    def force(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val docs = Tables.documents(spark, d)

    // variant helpers: shingleHashRowsDistinctPerDoc without repartition
    def shinglesNoRepart(df: DataFrame, idCol: String): DataFrame = {
      val P = graft.ops.DedupOps.MersennePrime31
      val sh = ColumnGlue.column(graft.expressions.ShingleHashes(
        ColumnGlue.expression(col("_toks"))))
      df.select(col(idCol),
          (graft.ops.DedupOps.hash60(graft.ops.TextOps.normalize(col("text"))) % P).as("_doc_h"),
          graft.ops.TextOps.tokens(col("text")).as("_toks"))
        .select(col(idCol),
          explode(when(size(col("_toks")) >= 3, array_distinct(sh))
            .otherwise(array(col("_doc_h")))).as("_h"))
    }

    def decontamNoRepart(repartTrain: Boolean): DataFrame = {
      val bucket = graft.ops.Sampling.bucketOf(col("doc_id"), "contam")
      val testDocs = docs.filter(bucket < 100)
      val trainIn = if (repartTrain)
        docs.filter(bucket >= 100).repartition(col("doc_id"))
      else docs.filter(bucket >= 100)
      val trainShingles = shinglesNoRepart(trainIn, "doc_id")
        .select(col("doc_id"), col("_h"))
      val testShingles = broadcast(
        shinglesNoRepart(testDocs, "doc_id").select(col("_h")).distinct())
        .withColumn("_m", lit(1L))
      trainShingles.join(testShingles, Seq("_h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("_m"), lit(0L))).as("n_matched"))
        .withColumn("overlap_ppm", expr("n_matched * 1000000 div n_shingles"))
        .withColumn("contaminated", col("overlap_ppm") >= 500000L)
    }

    def current(): Unit = t("decontam current")(force(
      SparkEntry.queries("llm_decontam")(spark, d)))
    def noRepart(): Unit = t("decontam no-repartition")(force(
      decontamNoRepart(repartTrain = false)))
    def trainOnly(): Unit = t("decontam repart train only")(force(
      decontamNoRepart(repartTrain = true)))

    if (sys.env.get("PROF_ORDER").contains("norepart_first")) {
      noRepart(); trainOnly(); current()
    } else { current(); trainOnly(); noRepart() }
    spark.stop()
  }
}
