package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch profiler for the embedding near-dup mega-cluster question (r20,
  * r19-verdict task 4; not registered): on a skewed corpus whose hot
  * cluster shares one hyperplane bucket, does a recall-preserving
  * hot-bucket sub-split exist?
  *
  * Measures, on SPARK_GRAFT_SF_DIR (default /tmp/sf1.0-skew):
  *  1. the (band, bucket) size histogram and candidate-slot counts —
  *     total, and the share inside buckets over the cap;
  *  2. the baseline multiband output (pair count, wall time);
  *  3. a hot-bucket sub-split variant (buckets > cap re-keyed with
  *     `extraPlanes` additional hyperplanes at planeOffset = bands ×
  *     planesPerBand, candidates within (band, bucket, sub) only):
  *     surviving-pair delta vs baseline = the RECALL LOSS, and the slot
  *     reduction it buys. A tight cluster is nearly sign-invariant under
  *     random hyperplanes, so the split is expected to barely divide true
  *     near-dup cliques (members share sub-buckets) while the verdict's
  *     open question is whether the output-pair set survives exactly.
  */
object MbSkewProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0-skew")
    val (bands, planes, dim, minCos, cap) = (3, 8, 64, 0.2, 1000L)
    import Prof.t
    def force(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val corpus = Tables.embeddings(spark, d)
    println(s"[mb-skew] corpus rows: ${corpus.count()}")

    // --- bucket histogram ---------------------------------------------
    val bb = Similarity.lshBandBuckets(corpus, bands, planes).localCheckpoint()
    val sizes = bb.groupBy(col("band"), col("bucket")).count().localCheckpoint()
    val top = sizes.orderBy(col("count").desc).limit(5).collect()
    println(s"[mb-skew] top buckets: ${top.map(r =>
      s"(b${r.getInt(0)},${r.getLong(1)})=${r.getLong(2)}").mkString(", ")}")
    val slotExpr = (col("count") * (col("count") - 1) / 2).cast("long")
    val totalSlots = sizes.agg(sum(slotExpr)).head.getLong(0)
    val hotSlots = sizes.filter(col("count") > cap).agg(sum(slotExpr))
      .head.getLong(0)
    println(s"[mb-skew] candidate slots total=$totalSlots hot(>${cap})=$hotSlots " +
      f"(${100.0 * hotSlots / math.max(1, totalSlots)}%.1f%%)")

    // --- baseline ------------------------------------------------------
    def baseline() = Similarity.embeddingNearDupMultiband(corpus, minCos,
      bands, planes, dim)
    t("baseline multiband")(force(baseline()))
    val basePairs = baseline().select(col("id_a"), col("id_b")).localCheckpoint()
    println(s"[mb-skew] baseline pairs: ${basePairs.count()}")

    // --- hot-bucket sub-split variant -----------------------------------
    val keyed = corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Similarity.qdot(col("qv"), col("qv")))
      .localCheckpoint()
    for (extraPlanes <- Seq(2, 4)) {
      val hot = sizes.filter(col("count") > cap).select(col("band"), col("bucket"))
      val subKeyed = bb.join(keyed.select(col("vec_id"), col("qv")), Seq("vec_id"))
        .join(broadcast(hot.withColumn("_hot", lit(true))), Seq("band", "bucket"), "left")
        .select(col("vec_id"), col("band"), col("bucket"),
          when(col("_hot"),
            Similarity.lshKeyQ(col("qv"), extraPlanes, dim, bands * planes))
            .otherwise(lit(-1L)).as("sub"))
        .localCheckpoint()
      val subSizes = subKeyed.groupBy(col("band"), col("bucket"), col("sub")).count()
      val splitSlots = subSizes.agg(sum(slotExpr)).head.getLong(0)
      val a = subKeyed.select(col("band"), col("bucket"), col("sub"), col("vec_id").as("id_a"))
      val b = subKeyed.select(col("band"), col("bucket"), col("sub"), col("vec_id").as("id_b"))
      def splitRun() = a.join(b, Seq("band", "bucket", "sub"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .join(keyed.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("n2").as("na2")), Seq("id_a"))
        .join(keyed.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("n2").as("nb2")), Seq("id_b"))
        .withColumn("score", Similarity.qdot(col("qa"), col("qb")))
        .filter(col("score") > lit(minCos) * sqrt((col("na2") * col("nb2")).cast("double")))
        .select(col("id_a"), col("id_b")).distinct()
      t(s"split(+$extraPlanes planes)")(force(splitRun()))
      val splitPairs = splitRun().localCheckpoint()
      val lost = basePairs.except(splitPairs).count()
      val kept = splitPairs.count()
      println(s"[mb-skew] +$extraPlanes planes: slots $totalSlots -> $splitSlots, " +
        s"pairs $kept (lost $lost of ${basePairs.count()})")
    }
    spark.stop()
  }
}
