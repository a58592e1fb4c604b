package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

// Temporary r17 diagnostic: decompose llm_pii_redact's cost at a given sf.
object PiiProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    val spark = Harness.session("32")
    val docs = Tables.documents(spark, sfDir)
    // same synthesis as QueriesLlm.piiRaw (email-only residue suffices for timing)
    val raw = docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 7 === 0, lit(" contact user@example.com now")).otherwise(lit(""))).as("raw_text"))
      .localCheckpoint()
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[pii] $name rep$r ${(System.nanoTime()-t0)/1e9}%6.2f s")
      }
    }
    t("counts only")(raw.select(col("doc_id"),
      regexp_count(col("raw_text"), lit(TextOps.EmailRe)).as("a"),
      regexp_count(col("raw_text"), lit(TextOps.PhoneRe)).as("b"),
      regexp_count(col("raw_text"), lit(TextOps.Ipv4Re)).as("c"),
      regexp_count(col("raw_text"), lit(TextOps.Ipv6Re)).as("d"),
      regexp_count(col("raw_text"), lit(TextOps.IbanRe)).as("e"),
      regexp_count(col("raw_text"), lit(TextOps.SsnRe)).as("f")))
    t("redact only")(raw.select(col("doc_id"),
      TextOps.redactPii(col("raw_text")).as("redacted")))
    t("one count (email)")(raw.select(col("doc_id"),
      regexp_count(col("raw_text"), lit(TextOps.EmailRe)).as("a")))
    t("one count (longnum)")(raw.select(col("doc_id"),
      regexp_count(col("raw_text"), lit(TextOps.LongNumRe)).as("a")))
    t("one count (ipv6)")(raw.select(col("doc_id"),
      regexp_count(col("raw_text"), lit(TextOps.Ipv6Re)).as("a")))
    spark.stop()
  }
}
