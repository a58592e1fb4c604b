package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Sampling, TextOps}

/** Scratch same-JVM stage profiler for the round-21 targets (not
  * registered): the llm_segment_dedup grouping-key A/B (task 5), the
  * llm_decontam_hash train-side repartition A/B (task 6), and the
  * manifest-family build decomposition (task 4). PROF_ORDER=alt_first
  * flips each A/B pair per the both-orders discipline. */
object R21Prof {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    import Prof.t
    def force(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val docs = Tables.documents(spark, d)
    val which = args.headOption.getOrElse("all")
    val altFirst = sys.env.get("PROF_ORDER").contains("alt_first")

    // ---- llm_segment_dedup: string vs (hash60, string) grouping key ----
    if (which == "all" || which == "seg") {
      val segTokens = 8
      def perDocSeg = docs
        .select(col("doc_id"), TextOps.normalize(col("text")).as("_norm"))
        .filter(length(col("_norm")) > 0)
        .select(col("doc_id"),
          explode(TextOps.segGroups(TextOps.tokens(col("_norm")), segTokens)).as("_g"))
        .select(col("_g.s").as("segment"), col("doc_id"), col("_g.x").as("_idxs"))
      def downstream(perSeg: DataFrame): DataFrame = {
        val totals = docs.select(col("doc_id"),
          when(col("text").isNull ||
              length(TextOps.normalize(col("text"))) === 0, 0L)
            .otherwise(ceil(size(TextOps.tokens(col("text"))) / segTokens.toDouble)
              .cast("long")).as("n_segs"))
        val kept = perSeg.filter(col("_nd") <= 1)
          .select(col("_w").getField("i").as("doc_id"), col("segment"),
            explode(col("_w").getField("x")).as("seg_idx"))
        val perDoc = kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("_nkept"),
            array_join(transform(
              array_sort(collect_list(struct(col("seg_idx"), col("segment")))),
              x => x.getField("segment")), " ").as("cleaned_text"))
        totals.join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
            col("n_segs"),
            (col("n_segs") - coalesce(col("_nkept"), lit(0L))).as("n_removed"))
      }
      def strKey = downstream(perDocSeg.groupBy(col("segment"))
        .agg(count(lit(1)).as("_nd"),
          min(struct(col("doc_id").as("i"), col("_idxs").as("x"))).as("_w")))
      def hashKey = downstream(perDocSeg
        .groupBy(xxhash64(col("segment")).as("_hk"), col("segment"))
        .agg(count(lit(1)).as("_nd"),
          min(struct(col("doc_id").as("i"), col("_idxs").as("x"))).as("_w"))
        .drop("_hk"))
      def runStr(): Unit = t("segdedup str key")(force(strKey))
      def runHash(): Unit = t("segdedup (xxh,str) key")(force(hashKey))
      if (altFirst) { runHash(); runStr() } else { runStr(); runHash() }
    }

    // ---- llm_decontam_hash: train repartition(id) vs none ----
    if (which == "all" || which == "decontam") {
      val bucket = Sampling.bucketOf(col("doc_id"), "contam")
      def variant(repartitionById: Boolean): DataFrame = {
        val testShingles = DedupOps
          .shingleHashRowsDistinctPerDoc(docs.filter(bucket < 100),
            "doc_id", "text", repartitionById = false)
          .select(col("_h")).distinct().withColumn("_m", lit(1L))
        val trainShingles = DedupOps.shingleHashRowsDistinctPerDoc(
            docs.filter(bucket >= 100), "doc_id", "text",
            repartitionById = repartitionById)
          .select(col("doc_id"), col("_h"))
        trainShingles.join(testShingles, Seq("_h"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("_m"), lit(0L))).as("n_matched"))
          .withColumn("overlap_ppm", expr("n_matched * 1000000 div n_shingles"))
          .withColumn("contaminated", col("overlap_ppm") >= 500000L)
      }
      def runRep(): Unit = t("decontam_hash repart(id)")(force(variant(true)))
      def runNoRep(): Unit = t("decontam_hash no repart")(force(variant(false)))
      if (altFirst) { runNoRep(); runRep() } else { runRep(); runNoRep() }
    }

    // ---- manifest family: where does manifest_diff's build go? ----
    if (which == "all" || which == "manifest") {
      val based = TextOps.withNormToks(docs, "text")
      val nTokens = when(length(col("_norm")) === 0, 0L)
        .otherwise(size(col("_toks")).cast("long"))
      def manifestInput = based.select(col("doc_id"), nTokens.as("n_tokens"),
        graft.ops.Assemble.contentChecksumTerm(col("text")).as("_csum"))
      def diffInput = based.select(col("doc_id"), nTokens.as("n_tokens"),
        graft.ops.Assemble.contentChecksumTerm(col("text")).as("_csum"),
        (pmod(col("doc_id"), lit(10)) === 0).as("_isB"))
      t("manifest input scan")(force(manifestInput))
      t("diff input scan")(force(diffInput))
      t("manifest cumsum+rollup")(force(
        graft.ops.Assemble.shardPlan(manifestInput, "doc_id", "n_tokens",
          shardTokens = 2000L, salt = "shard")))
      t("diff cumsum+rollup")(force(
        graft.ops.Assemble.shardPlan(diffInput, "doc_id", "n_tokens",
          shardTokens = 2000L, salt = "shard", partitionCols = Seq("_isB"))))
      t("shard_manifest full")(force(
        SparkEntry.queries("llm_shard_manifest")(spark, d)))
      t("manifest_diff full")(force(
        SparkEntry.queries("llm_manifest_diff")(spark, d)))
      t("shard_zonemap full")(force(
        SparkEntry.queries("llm_shard_zonemap")(spark, d)))
    }

    spark.stop()
  }
}
