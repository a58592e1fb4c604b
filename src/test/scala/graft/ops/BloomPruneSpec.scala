package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "payload")
  private lazy val small = Seq(3L, 999L, 1500L, 4242L, 4999L).toDF("sk")

  test("no false negatives: pruned join result equals the plain join") {
    val pruned = BloomPrune.prunedJoin(big, small, "k", "sk", mBits = 1 << 12)
      .select($"k").as[Long].collect().toSet
    val exact = big.join(small, $"k" === $"sk").select($"k").as[Long].collect().toSet
    assert(pruned == exact)
    assert(exact == Set(3L, 999L, 1500L, 4242L, 4999L))
  }

  test("the probe predicate actually prunes the big side") {
    val words = BloomPrune.buildWords(small, $"sk", mBits = 1 << 12, k = 3)
    val kept = big.filter(BloomPrune.mightContain($"k", words)).count()
    // 5 true keys; false-positive rate at 5 keys / 4096 bits / k=3 is tiny —
    // anything under 1% of 5000 shows the scan-side cut is real.
    assert(kept >= 5 && kept < 50, s"kept $kept of 5000")
  }

  test("filter words: membership bits are set for every inserted key") {
    val words = BloomPrune.buildWords(small, $"sk", mBits = 1 << 10, k = 4)
    assert(words.length == (1 << 10) / 64)
    val onSmall = small.filter(BloomPrune.mightContain($"sk", words, k = 4)).count()
    assert(onSmall == 5, "every inserted key must test positive")
  }

  test("mixed-type keys (INT probe vs BIGINT build) keep the no-false-negative contract") {
    // xxhash64 is type-sensitive: without canonicalization, INT 3 on the big
    // side and BIGINT 3 on the small side hash to different bits and the
    // matching rows silently vanish from the pruned join.
    val bigInt32 = (1 to 5000).map(i => (i, s"v$i")).toDF("k", "payload") // k: INT
    val pruned = BloomPrune.prunedJoin(bigInt32, small, "k", "sk", mBits = 1 << 12)
      .select($"k").as[Int].collect().toSet
    assert(pruned == Set(3, 999, 1500, 4242, 4999))
  }

  test("probe predicate stays in whole-stage codegen (no UDF, no shuffle)") {
    val words = BloomPrune.buildWords(small, $"sk", mBits = 1 << 12)
    val plan = big.filter(BloomPrune.mightContain($"k", words))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"probe must be pure Column work:\n$plan")
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
  }
}
