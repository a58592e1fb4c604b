package graft
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    // Local-iteration subset (same contract as Bench): run only the named
    // queries, leaving other queries' previous dumps in outDir untouched.
    // An empty or fully-misspelled selection is an ERROR, not a no-op run —
    // running zero queries would let the checker greenlight stale dumps.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // ANY unknown requested name is an error, not just an all-unknown list:
    // 'llm_decontam,llm_decontamm' silently running the valid half would let
    // the checker compare the typo'd query's stale dump and greenlight it.
    val unknown = only.map(_ -- SparkEntry.queries.keySet).getOrElse(Set.empty)
    if (unknown.nonEmpty) {
      System.err.println(s"[verify] SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
      spark.stop(); sys.exit(2)
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    if (selected.isEmpty) {
      System.err.println(s"[verify] SPARK_GRAFT_ONLY matched no queries: ${only.getOrElse(Set())}")
      spark.stop(); sys.exit(2)
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      // Same small-query execution policy as Bench, so the correctness gate
      // exercises the exact configuration the bench times (at sf0.01 nearly
      // every scan-shaped query qualifies, so the interpreted + non-adaptive
      // path is the one being oracle-checked for them).
      try graft.runtime.ExecPolicy.run(fn(spark, sfDir).coalesce(1))(
        _.write.mode("overwrite").parquet(s"$outDir/$name"))
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        // Remove any STALE output from a previous run: overwrite never
        // executed, and the gate only flags MISSING dirs — a leftover
        // result would let a regression pass against last run's parquet.
        deleteRecursively(Paths.get(s"$outDir/$name"))
      }
    }
    // Machine-readable failure record (r8 advice: 52 analysis errors were
    // invisible in the correctness artifact because erroring queries simply
    // had no output dir — the checker folds these into err-populated rows).
    val errJson = errors
      .map { case (k, v) => s""""${Harness.jsonEscape(k)}": "${Harness.jsonEscape(v)}"""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s""""${Harness.jsonEscape(k)}": "${Harness.jsonEscape(v)}"""" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally walk.close()
    }
}
