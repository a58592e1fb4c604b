package graft

/** Registry-wide contract checks, run over every entry in
  * [[SparkEntry.allQueries]] at sf0.001:
  *
  *  - every registered query executes (no analysis/runtime exception) and
  *    yields a non-empty schema — an unregistered or broken query is
  *    invisible to the driver's correctness gate, so this spec is the local
  *    tripwire;
  *  - names are unique (a duplicate would silently shadow a Map entry);
  *  - for every query with an oracle, each output column name appears in
  *    the oracle SQL text — the driver compares column-name-sorted hashes,
  *    so an alias drift between the Spark result and the SQL is an
  *    automatic hash mismatch even when values agree.
  */
class RegisteredQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("registry names are unique and the registry is not shrinking") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(names.size >= 75, s"registry shrank to ${names.size} queries")
  }

  test("every registered query runs at sf0.001 with a non-empty schema") {
    val failures = SparkEntry.allQueries.flatMap { q =>
      try {
        val df = q.run(spark, sfDir)
        assert(df.schema.nonEmpty)
        // noop write forces EVERY partition and expression — limit(1)
        // short-circuits after the first row and count() prunes
        // projections, either of which would hide per-row runtime errors.
        df.write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(160)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle query's output columns appear in its oracle SQL") {
    val drifted = SparkEntry.allQueries.flatMap { q =>
      q.oracle.toSeq.flatMap { sql =>
        val lower = sql.toLowerCase
        val cols = q.run(spark, sfDir).schema.fieldNames
        val missing = cols.filterNot(c => lower.contains(c.toLowerCase))
        if (missing.isEmpty) None
        else Some(s"${q.name}: columns ${missing.mkString(",")} not in oracle SQL")
      }
    }
    assert(drifted.isEmpty, drifted.mkString("\n"))
  }
}
