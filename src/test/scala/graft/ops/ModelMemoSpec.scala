package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The session model memo's keying contract: same (plan, tag) hits, any
  * parameter or DATA difference misses — the property that makes the memo
  * bit-invisible (a stale hit on different data would silently serve a
  * wrong model; a miss on an identical retrain merely costs time). */
class ModelMemoSpec extends SparkSpec {
  import spark.implicits._

  test("memo hits on identical (corpus plan, tag); misses on tag or data change") {
    var fits = 0
    def fit(df: org.apache.spark.sql.DataFrame, tag: String): java.lang.Long =
      ModelMemo.memo(df, tag) { fits += 1; java.lang.Long.valueOf(fits.toLong) }

    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val a2 = Seq((1L, "x"), (2L, "y")).toDF("id", "t")   // same data, same plan shape
    val b = Seq((1L, "x"), (2L, "DIFFERENT")).toDF("id", "t") // different data

    val first = fit(a, "k:1")
    assert(fit(a, "k:1") eq first, "identical DataFrame must hit")
    assert(fit(a2, "k:1") eq first,
      "an equal LocalRelation (same data) canonicalizes equal and must hit")
    assert(fit(a, "k:2") ne first, "a different param tag must miss")
    assert(fit(b, "k:1").longValue() > first.longValue(),
      "different DATA embeds a different plan and must miss")
    // derived plans differ from their base: a filter over `a` is a new key
    assert(fit(a.filter(col("id") > 1L), "k:1").longValue() > first.longValue())
  }

  test("Bpe.train memo returns the identical merge list instance across calls") {
    val docs = Seq((1L, "aa ab aa ab"), (2L, "aa ab")).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, "text", 2)
    val m2 = Bpe.train(docs, "text", 2)
    assert(m1 eq m2, "second train must be served from the session memo")
    assert(Bpe.train(docs, "text", 3) ne m1, "different nMerges must retrain")
  }
}
