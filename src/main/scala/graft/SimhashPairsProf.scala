package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Lineage, TextOps}

/** Scratch decomposition of dedup_simhash_pairs at a given sfdir: times the
  * fingerprint pass, the checkpoint build, the band/bucket/pair stage and
  * the verify joins separately (noop-forced). Not part of any query path. */
object SimhashPairsProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val docs = Tables.documents(spark, sfDir)
      val sh0 = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), expr("simhash_fp(_toks, 60)").as("simhash"))
        .filter(col("simhash").isNotNull)
      time("fingerprint pass (no ckpt)") { noop(sh0) }
      var sh: org.apache.spark.sql.DataFrame = null
      time("checkpoint build") { sh = sh0.transform(Lineage.cut) }
      val banded = sh.select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), 15 * b).bitwiseAND(0x7fff)): _*))
          .as(Seq("band", "bucket")))
      time("banded noop") { noop(banded) }
      val cand = DedupOps.candidatePairs(banded, "doc_id")
      time("candidatePairs noop") { noop(cand) }
      time("candidatePairs count") { println("  pairs: " + cand.count()) }
      val full = cand
        .join(sh.select(col("doc_id").as("id_a"), col("simhash").as("_ha")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("simhash").as("_hb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
      time("full verify noop") { noop(full) }
    }
    spark.stop()
  }
}
