import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Sampling, TextOps}

/** Same-run A/B for refFreqQuality's corpus-materialization question:
  * (a) SHIPPED: checkpoint the (id, token-array) projection once, derive
  *     both the occurrence explode and the distinct-explode vocab from it;
  * (b) TWO-PASS: no checkpoint — the vocab pass re-tokenizes only the
  *     reference slice (the bucketOf filter sits below the tokenizer, so
  *     the second pass reads ~30% of the corpus), the scoring pass
  *     tokenizes the full corpus once.
  * At 100 TB (b) avoids materializing the tokenized corpus entirely;
  * locally the checkpoint write+read competes with the 0.3× re-tokenize.
  * Temporary measurement harness; results land in BENCHNOTES.md. */
object RefFreqProfile {
  def main(args: Array[String]): Unit = {
    val docCopies = sys.env.getOrElse("SCALE_DOC_COPIES", "20").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val copies = spark.range(docCopies).withColumnRenamed("id", "copy")
    val docs = docs0.crossJoin(copies)
      .select((col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") < 2, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(lit("c"), col("copy"), t)), " ")).as("text"))
    docs.cache(); val n = docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ref] $name%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($r rows over $n docs)")
    }
    def force(df: DataFrame): Long = df.filter(col("bucket").isNotNull).count()
    val shipped = () => force(TextOps.refFreqQuality(docs, "doc_id", "text"))
    val twoPass = () => {
      // inline variant: no checkpoint, vocab pass filters BEFORE tokenizing
      val refPermille = 300; val minDf = 2
      val occ = TextOps.withNormToks(docs.select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), explode(col("_toks")).as("tok"))
        .filter(length(col("tok")) > 0)
      val vocab0 = TextOps.withNormToks(
          docs.filter(Sampling.bucketOf(col("doc_id"), "ref") < refPermille)
            .select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), explode(array_distinct(col("_toks"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
      val vocab = if (vocab0.limit(4000001).count() <= 4000000) broadcast(vocab0) else vocab0
      val scored = occ.join(vocab, Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("df").isNull, 1L).otherwise(0L)).as("n_oov"),
          sum(when(col("df").isNotNull, expr("1000000 div df")).otherwise(0L)).as("_rsum"),
          sum(when(col("df").isNotNull, 1L).otherwise(0L)).as("_nv"))
        .withColumn("oov_ppm", expr("n_oov * 1000000 div n_toks"))
        .withColumn("rarity_pts",
          when(col("_nv") > 0, expr("_rsum div _nv")).otherwise(lit(1000000L)))
        .withColumn("bucket",
          when(col("oov_ppm") >= 400000L || col("rarity_pts") >= 250000L, lit("tail"))
            .when(col("rarity_pts") < 150000L && col("oov_ppm") < 100000L, lit("head"))
            .otherwise(lit("middle")))
      force(scored)
    }
    val stages: Seq[(String, () => Long)] = Seq(
      "shipped (ckpt)" -> shipped, "two-pass" -> twoPass,
      "shipped (ckpt) #2" -> shipped, "two-pass #2" -> twoPass)
    val run = if (sys.env.get("REF_ORDER").contains("two_first"))
      Seq(stages(1), stages(0), stages(3), stages(2)) else stages
    run.foreach { case (k, f) => t(k)(f()) }
    spark.stop()
  }
}
