package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class StatefulRetrySpec extends SparkSpec {
  import spark.implicits._
  import StatefulRetry._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attempts accumulate across micro-batches, success clears state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Attempt]
    val query = decide(input.toDS()).writeStream
      .format("memory").queryName("retry_stream").outputMode("append").start()
    try {
      // batch 1: two failures for k1, one for k2
      input.addData(
        Attempt("k1", ts("2024-01-01 10:00:00"), success = false),
        Attempt("k1", ts("2024-01-01 10:05:00"), success = false),
        Attempt("k2", ts("2024-01-01 10:00:00"), success = false))
      query.processAllAvailable()
      // batch 2: k1 fails again (state carried over), k2 succeeds
      input.addData(
        Attempt("k1", ts("2024-01-01 11:00:00"), success = false),
        Attempt("k2", ts("2024-01-01 11:00:00"), success = true))
      query.processAllAvailable()
      // batch 3: k2 fails afresh — counter restarted after its success
      input.addData(Attempt("k2", ts("2024-01-01 12:00:00"), success = false))
      query.processAllAvailable()

      val rows = spark.sql(
        "SELECT sourceKey, attempts, backoffSeconds, resolved FROM retry_stream")
        .as[(String, Int, Long, Boolean)].collect().toSet
      // k1: 1st→60 s (one base delay), 2nd→120 s, 3rd (next batch)→240 s
      assert(rows.contains(("k1", 1, 60L, false)))
      assert(rows.contains(("k1", 2, 120L, false)))
      assert(rows.contains(("k1", 3, 240L, false)))
      // k2: fail, resolve, then a FRESH attempt 1
      assert(rows.contains(("k2", 1, 60L, false)))
      assert(rows.contains(("k2", 0, 0L, true)))
      assert(rows.count { case (k, a, _, _) => k == "k2" && a == 1 } == 1) // set: same row
      val k2Fresh = spark.sql(
        "SELECT count(*) FROM retry_stream WHERE sourceKey='k2' AND attempts=1")
        .as[Long].head()
      assert(k2Fresh == 2, "post-success failure must restart at attempt 1")
    } finally query.stop()
  }

  test("backoff caps at 6 h and maxAttempts flags gaveUp") {
    val attempts = (1 to 10).map(i =>
      Attempt("k", ts(f"2024-01-01 ${9 + i}%02d:00:00"), success = false)).toDS()
    val out = decide(attempts, baseBackoffSeconds = 60L, maxAttempts = 5)
      .collect().sortBy(_.attempts)
    assert(out.map(_.backoffSeconds).max == MaxBackoffSeconds)
    assert(out.filter(_.gaveUp).map(_.attempts).min == 5)
    assert(out.take(3).map(_.backoffSeconds).toSeq == Seq(60L, 120L, 240L))
  }
}
