package graft

import org.apache.spark.sql.functions._

/** Shared warm-repeat timing loop for the scratch profilers below. */
private[graft] object Prof {
  def t(name: String)(f: => Long): Unit = {
    for (i <- 1 to 3) {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s #$i ${(System.nanoTime()-t0)/1e9}%6.2f s ($r rows)")
    }
  }
}

/** Scratch same-JVM stage profiler for the graph family (not registered). */
object GraphProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val rows = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("_txn"), col("l_partkey").as("item"))
    import Prof.t
    def grouped = rows.groupBy(col("_txn"))
      .agg(sort_array(collect_set(col("item").cast("long"))).as("_items"))
    t("groupBy collect_set")(grouped.count())
    def hofOrder(): Unit = t("explode HOF")(
      grouped.select(explode(expr(
        """flatten(transform(_items, (x, i) ->
          |  transform(slice(_items, i + 2, size(_items)), y ->
          |    struct(x AS pa, y AS pb))))""".stripMargin)).as("_e")).count())
    def nativeOrder(): Unit = t("explode native pair_structs")(
      grouped.select(explode(expr("pair_structs(_items)")).as("_e")).count())
    if (sys.env.get("PROF_ORDER").contains("native_first")) { nativeOrder(); hofOrder() }
    else { hofOrder(); nativeOrder() }
    // r12 A/B (round-10 s4 rule f): is the corpus-scale localCheckpoint of
    // the distinct (txn, item) projection worth it, or does exchange reuse
    // make the 3-consumer rescan free? PROF_ORDER=rescan_first flips.
    def ckptShape(): Unit = t("assoc rules (fact ckpt)")(
      graft.ops.GraphOps.associationRules(rows, "_txn", "item", 2,
        checkpointFacts = true).count())
    def rescanShape(): Unit = t("assoc rules (rescan)")(
      graft.ops.GraphOps.associationRules(rows, "_txn", "item", 2,
        checkpointFacts = false, basketCheckpoint = false).count())
    def basketShape(): Unit = t("assoc rules (basket ckpt)")(
      graft.ops.GraphOps.associationRules(rows, "_txn", "item", 2).count())
    if (sys.env.get("PROF_ORDER").contains("rescan_first")) {
      rescanShape(); basketShape(); ckptShape()
    } else if (sys.env.get("PROF_ORDER").contains("basket_first")) {
      basketShape(); rescanShape(); ckptShape()
    } else { ckptShape(); rescanShape(); basketShape() }
    spark.stop()
  }
}

/** Same-JVM A/B: native winnow_mins vs the former exploded-window shape. */
object WinnowProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    import Prof.t
    import graft.ops.{DedupOps, TextOps}
    val P = DedupOps.MersennePrime31
    val w = 4
    def native(): Unit = t("winnow native")(
      DedupOps.winnowFingerprints(docs, "doc_id", "text").count())
    def oldShape(): Unit = t("winnow exploded HOF") {
      val m = size(col("_toks")) - 2
      def h(j: Int) = when(col("_i") + j < m,
        DedupOps.hash60(concat_ws(" ",
          expr(s"element_at(_toks, _i + ${j + 1})"),
          expr(s"element_at(_toks, _i + ${j + 2})"),
          expr(s"element_at(_toks, _i + ${j + 3})"))) % P)
      docs.repartition(col("doc_id"))
        .select(col("doc_id"),
          (DedupOps.hash60(TextOps.normalize(col("text"))) % P).as("_doc_h"),
          TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), col("_doc_h"), col("_toks"),
          explode(sequence(lit(0), greatest(size(col("_toks")) - 2 - w, lit(0)))).as("_i"))
        .select(col("doc_id"),
          when(size(col("_toks")) >= 3, least((0 until w).map(h): _*))
            .otherwise(col("_doc_h")).as("fingerprint"))
        .distinct().count()
    }
    if (sys.env.get("PROF_ORDER").contains("native_first")) { native(); oldShape() }
    else { oldShape(); native() }
    spark.stop()
  }
}

/** Same-JVM A/B: native simhash_fp vs the former exploded 60-sum aggregate. */
object SimhashProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    import Prof.t
    import graft.ops.{DedupOps, TextOps}
    val bits = 60
    def native(): Unit = t("simhash60 native map-only")(
      DedupOps.simhashWide(docs, "doc_id", "text", bits)
        .agg(sum(col("simhash") % 1000003L)).collect()(0).getLong(0))
    def oldShape(): Unit = t("simhash60 exploded 60-sum") {
      val exploded = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h", DedupOps.hash60(col("tok")))
      val bitSums = (0 until bits).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit_$i")
      }
      exploded.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until bits).map(i => when(col(s"bit_$i") > 0, lit(1L << i)).otherwise(0L))
            .reduce(_ + _).as("simhash"))
        .agg(sum(col("simhash") % 1000003L)).collect()(0).getLong(0)
    }
    if (sys.env.get("PROF_ORDER").contains("native_first")) { native(); oldShape() }
    else { oldShape(); native() }
    spark.stop()
  }
}

/** Same-JVM A/B: native minhash_sigs vs the exploded 8-min aggregate. */
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    import Prof.t
    import graft.ops.DedupOps
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum((0 until 8).map(j => col(s"sig_$j")).reduce(_ + _) % 1000003L))
        .collect()(0).getLong(0)
    def native(): Unit = t("minhash sigs native")(
      force(DedupOps.minhashSignature(docs, "doc_id", "text", 8)))
    def oldShape(): Unit = t("minhash sigs exploded agg") {
      val aggs = DedupOps.permParams(8).zipWithIndex.map { case ((a, b), j) =>
        min((lit(a) * col("_h") + lit(b)) % DedupOps.MersennePrime31).as(s"sig_$j")
      }
      force(DedupOps.shingleHashRows(docs, "doc_id", "text")
        .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*))
    }
    if (sys.env.get("PROF_ORDER").contains("native_first")) { native(); oldShape() }
    else { oldShape(); native() }
    spark.stop()
  }
}
