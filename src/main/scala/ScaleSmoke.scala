import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Similarity}

/** Scale smoke: replicate documents 20x (100k docs) and embeddings 4x (200k
  * vectors) and check the dedup/ANN pipelines scale ~linearly. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = docs0.count()
    // 20 copies, each with shifted ids; even copies keep identical text
    // (real duplicates for the pipeline to find).
    val copies = spark.range(20).withColumnRenamed("id", "copy")
    val docs = docs0.crossJoin(copies)
      .select((col("doc_id") + col("copy") * 1000000).as("doc_id"),
        when(col("copy") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" variant "), col("copy"))).as("text"))
    docs.cache(); val n = docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name%-26s ${(System.nanoTime()-t0)/1e9}%7.2f s  ($r rows over $n docs)")
    }
    t("exact dedup")(DedupOps.exactDedup(docs, "doc_id", "text").count())
    t("minhash signatures")(DedupOps.minhashSignature(docs, "doc_id", "text", 8).count())
    t("lsh candidate pairs")(DedupOps.candidatePairs(
      DedupOps.lshBuckets(DedupOps.minhashSignature(docs, "doc_id", "text", 8), "doc_id"), "doc_id").count())
    t("near-dup survivors (CC)")(DedupOps.nearDupSurvivors(docs, "doc_id", "text").count())
    // filter on cleaned_text length forces the ordered fold (a bare count
    // lets Catalyst prune the reassembly entirely — measured 0.2 s vs real)
    t("segment dedup")(DedupOps.dropBoilerplateSegments(docs, "doc_id", "text")
      .filter(length(col("cleaned_text")) >= 0).count())
    t("decontaminate")(DedupOps.decontaminate(docs, "doc_id", "text").count())
    t("chunk windows")(graft.ops.TextOps.chunkWindows(docs, "doc_id", "text").count())
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = emb0.crossJoin(spark.range(4).withColumnRenamed("id", "c"))
      .select((col("vec_id") + col("c") * 1000000).as("vec_id"), col("embedding"))
    emb.cache(); val m = emb.count()
    t(s"embedding near-dup ($m)")(Similarity.embeddingNearDup(emb, 0.2).count())
    t(s"multiband near-dup ($m)")(
      Similarity.embeddingNearDupMultiband(emb, 0.2, bands = 3, planesPerBand = 8).count())
    t(s"ivf top-k ($m corpus)")(
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 16), 10,
        numCentroids = 32, nprobe = 3).count())
    spark.stop()
  }
}
