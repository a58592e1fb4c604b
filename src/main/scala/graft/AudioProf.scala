package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Scratch decomposition of the mm audio queries: synth-only vs
  * synth+decode vs full fingerprint+rollup, noop-forced. */
object AudioProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      val ids = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 0)
      time("ids scan only") { noop(ids.select(col("doc_id"))) }
      val media = Multimodal.syntheticWavs(ids)
      time("synth only") { noop(media) }
      time("synth+decode") { noop(Multimodal.realDecodeAudio(media).toDF()) }
      val q = Multimodal.realAudioFingerprint(media).toDF()
        .filter(col("ok"))
        .groupBy(col("afp"))
        .agg(count(lit(1)).as("n_clips"), min(col("doc_id")).as("min_doc"))
      time("full audio_dedup") { noop(q) }
    }
    spark.stop()
  }
}
