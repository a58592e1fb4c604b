package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch same-JVM stage profiler for the bigram/token-string aggregation
  * family (r19 task 1) — not registered. Decomposes llm_collocations /
  * llm_tfidf_top / llm_bigram_coverage / llm_ref_quality into stages at
  * the decade fixture and A/Bs string grouping keys vs xxhash64 keys.
  * PROF_ORDER=hash_first flips each A/B pair. */
object GramProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    import Prof.t
    def force(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val docs = Tables.documents(spark, d)
    def toks = docs.select(graft.ops.TextOps.tokens(col("text")).as("_toks"))
      .filter(element_at(col("_toks"), 1) =!= "")

    t("tokenize only")(force(toks))

    // --- unigram aggregation: string vs hash keys ---
    def uniStr = toks.select(explode(col("_toks")).as("_token"))
      .groupBy(col("_token")).agg(count(lit(1)).as("_c"))
    def uniHash = toks.select(explode(col("_toks")).as("_token"))
      .groupBy(xxhash64(col("_token")).as("_h")).agg(count(lit(1)).as("_c"))
    def runUni(): Unit = { t("uni agg (string key)")(force(uniStr)) }
    def runUniH(): Unit = { t("uni agg (hash key)")(force(uniHash)) }

    // --- bigram aggregation: string vs hash keys ---
    def biBase = toks.filter(size(col("_toks")) >= 2)
      .select(col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - 2)).as("_i"))
    def biStr = biBase
      .select(concat_ws(" ",
        expr("element_at(_toks, _i + 1)"),
        expr("element_at(_toks, _i + 2)")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
    def biHash = biBase
      .select(expr("element_at(_toks, _i + 1)").as("_t1"),
        expr("element_at(_toks, _i + 2)").as("_t2"))
      .groupBy(xxhash64(col("_t1"), col("_t2")).as("_bh"),
        xxhash64(col("_t1")).as("_h1"), xxhash64(col("_t2")).as("_h2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
    def runBi(): Unit = { t("bi agg (string key)")(force(biStr)) }
    def runBiH(): Unit = { t("bi agg (hash key)")(force(biHash)) }

    if (sys.env.get("PROF_ORDER").contains("hash_first")) {
      runUniH(); runUni(); runBiH(); runBi()
    } else { runUni(); runUniH(); runBi(); runBiH() }

    // --- tfidf stages ---
    def occ = graft.ops.TextOps.withNormToks(docs, "text")
      .select(col("doc_id"), explode(col("_toks")).as("tok"))
      .filter(length(col("tok")) > 0)
    t("tfidf tf groupBy(doc,tok) str")(force(
      occ.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))))
    t("tfidf tf groupBy(doc,hash)")(force(
      occ.groupBy(col("doc_id"), xxhash64(col("tok")).as("_h"))
        .agg(count(lit(1)).as("tf"))))
    // === gram_counts kernel variants ===
    val tokCol = graft.ops.TextOps.tokens(col("text"))
    import org.apache.spark.sql.graftglue.ColumnGlue
    def gramCounts(mode: Int) = ColumnGlue.column(
      graft.expressions.GramCounts(ColumnGlue.expression(tokCol),
        ColumnGlue.expression(lit(mode))))

    // colloc: ONE pass, ONE fused uni+bi aggregation, joins on the
    // checkpointed vocab table
    def collocKernel(): DataFrame = {
      val grams = docs.select(explode(gramCounts(3)).as("g"))
        .groupBy(col("g.s").as("s")).agg(sum(col("g.c")).as("c"))
        .localCheckpoint()
      val uni = grams.filter(!col("s").contains(" "))
      val total = uni.agg(sum(col("c")).as("_t"))
      val bi = grams.filter(col("s").contains(" ") && col("c") >= 5)
        .select(col("s").as("bigram"), col("c").as("n_pair"),
          split(col("s"), " ").getItem(0).as("_w1"),
          split(col("s"), " ").getItem(1).as("_w2"))
      bi.join(broadcast(uni.select(col("s").as("_w1"), col("c").as("n_a"))), Seq("_w1"))
        .join(broadcast(uni.select(col("s").as("_w2"), col("c").as("n_b"))), Seq("_w2"))
        .crossJoin(broadcast(total))
        .select(col("bigram"), col("n_pair"), col("n_a"), col("n_b"),
          expr("((n_pair * 1000000 div n_a) * _t) div n_b").as("pmi_ppm"))
        .orderBy(col("pmi_ppm").desc, col("bigram"))
        .limit(50)
    }
    t("colloc kernel")(force(collocKernel()))

    // tfidf: map-only tf (no (doc,tok) groupBy, no checkpoint)
    def tfidfKernel(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      def tf = docs.select(col("doc_id"), explode(gramCounts(1)).as("g"))
        .select(col("doc_id"), col("g.s").as("tok"), col("g.c").as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_ppm").desc, col("tok"))
      tf.join(broadcast(dfreq), Seq("tok"))
        .withColumn("score_ppm", expr("tf * 1000000 div df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("tok"), col("tf"), col("df"),
          col("score_ppm"))
    }
    t("tfidf kernel")(force(tfidfKernel()))

    // coverage: pass 1 = distinct-scale top-20; pass 2 = MAP-ONLY literal
    // map probes
    def coverageKernel(): DataFrame = {
      val bc = docs.select(col("doc_id"),
          gramCounts(2).as("_bc"),
          (size(graft.ops.TextOps.tokens(col("text"))) - 1).cast("long").as("n_bigrams"))
        .filter(col("n_bigrams") >= 1)
      val top = bc.select(explode(col("_bc")).as("g"))
        .groupBy(col("g.s").as("s")).agg(sum(col("g.c")).as("freq"))
        .orderBy(col("freq").desc, col("s")).limit(20)
        .select(col("s")).collect().map(_.getString(0))
      val m = map_from_entries(col("_bc"))
      val hits = top.map(s => coalesce(element_at(m, lit(s)), lit(0L)))
        .reduceOption(_ + _).getOrElse(lit(0L))
      bc.select(col("doc_id"), col("n_bigrams"), hits.as("top_hits"))
        .withColumn("coverage_milli",
          floor(col("top_hits") * 1000.0 / col("n_bigrams")).cast("long"))
    }
    t("coverage kernel")(force(coverageKernel()))

    // refq: weighted distinct-scale join+agg
    def refqKernel(): DataFrame = {
      def occ = docs.select(col("doc_id"), explode(gramCounts(1)).as("g"))
        .select(col("doc_id"), col("g.s").as("tok"), col("g.c").as("c"))
      val vocab = graft.ops.TextOps.withNormToks(
          docs.filter(graft.ops.Sampling.bucketOf(col("doc_id"), "ref") < 300)
            .select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), explode(array_distinct(col("_toks"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      occ.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_toks"),
          sum(when(col("df").isNull, col("c")).otherwise(0L)).as("n_oov"),
          sum(when(col("df").isNotNull, col("c") * expr("1000000 div df"))
            .otherwise(0L)).as("_rsum"),
          sum(when(col("df").isNotNull, col("c")).otherwise(0L)).as("_nv"))
    }
    t("refq kernel")(force(refqKernel()))

    // coverage: kernel + distinct-scale broadcast join (no driver collect)
    def coverageKernelJoin(): DataFrame = {
      def bc = docs.select(col("doc_id"), gramCounts(2).as("_bc"))
        .filter(size(col("_bc")) > 0)
      val top = bc.select(explode(col("_bc")).as("g"))
        .groupBy(col("g.s").as("s")).agg(sum(col("g.c")).as("freq"))
        .orderBy(col("freq").desc, col("s")).limit(20)
        .select(col("s"))
      bc.select(col("doc_id"), explode(col("_bc")).as("g"))
        .select(col("doc_id"), col("g.s").as("s"), col("g.c").as("c"))
        .join(broadcast(top.withColumn("is_top", lit(1))), Seq("s"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"),
          sum(when(col("is_top") === 1, col("c")).otherwise(0L)).as("top_hits"))
        .withColumn("coverage_milli",
          floor(col("top_hits") * 1000.0 / col("n_bigrams")).cast("long"))
    }
    t("coverage kernel join")(force(coverageKernelJoin()))

    def fulls(): Unit = {
      t("tfidf full current")(force(SparkEntry.queries("llm_tfidf_top")(spark, d)))
      t("refq full current")(force(SparkEntry.queries("llm_ref_quality")(spark, d)))
      t("coverage full current")(force(SparkEntry.queries("llm_bigram_coverage")(spark, d)))
      t("colloc full current")(force(SparkEntry.queries("llm_collocations")(spark, d)))
    }
    fulls()

    spark.stop()
  }
}
