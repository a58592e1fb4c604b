package graft

import org.apache.spark.sql.functions._

/** Scratch same-JVM profiler: single-row-group scan parallelism (the
  * CLAUDE.md "repartition before heavy per-row work" trap) — how many map
  * tasks do the corpus scans get, and what does a pre-repartition buy the
  * map-heavy document queries? Not registered.
  *
  * Measured (sf0.1, both orders, quiet): documents and embeddings DO read
  * as 1 partition (events 2, lineitem 11), but the 5k-doc tokenize+winnow
  * map is only 0.27-0.41 s single-task warm and repartition(32) is a WASH
  * (0.29-0.37 s — the shuffle pays for the parallelism). The 1-task shape
  * is a local-scale artifact that matters under co-tenant load (one busy
  * core stalls the whole stage — f5's 0.4 → 5 s swings), not quiet; a
  * corpus respread was NOT shipped: it would put a round-robin exchange
  * into every document query's plan (breaking honest map-only pins) for a
  * measured wash. */
object ScanProf {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (t <- Seq("documents", "embeddings", "events", "lineitem")) {
      val df = Tables.read(spark, d, t)
      println(s"[scan] $t: ${df.rdd.getNumPartitions} partitions, ${df.count()} rows")
    }
    import Prof.t
    val docs = Tables.documents(spark, d)
    def heavy(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9]+", " "), " +", " ")), " ").as("_toks"))
      .select(col("doc_id"),
        when(size(col("_toks")) >= 3, expr("winnow_mins(_toks, 4)"))
          .otherwise(array()).as("_m"))
      .select(sum(expr("size(_m)")).as("n"))
    def plain(): Unit = t("heavy map, as-read")(
      heavy(docs).collect()(0).getLong(0))
    def repart(): Unit = t("heavy map, repartition(32)")(
      heavy(docs.repartition(32)).collect()(0).getLong(0))
    if (sys.env.get("PROF_ORDER").contains("repart_first")) { repart(); plain() }
    else { plain(); repart() }
    spark.stop()
  }
}
