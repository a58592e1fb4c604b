package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom-filter semi-join pruning — the scale pattern for "join a
  * huge fact table against a selective dimension subset": build an m-bit
  * Bloom filter over the small side's keys, push a `mightContain` predicate
  * into the big side's SCAN (it is a pure Column predicate over literal
  * arrays — codegen'd, no UDF, no shuffle), then run the exact join on the
  * survivors. The filter admits no false negatives, so the post-join result
  * is exactly the plain join's; false positives only cost wasted probe rows
  * (bounded by the classic (1-e^{-kn/m})^k rate).
  *
  * At 100 TB this is the difference between shuffling the whole fact table
  * into the join and shuffling ~selectivity of it: the Bloom words travel
  * with the closure (m/64 longs — 128 KiB at m=2^20), every executor
  * filters locally, and AQE sees the reduced row count. Spark's own
  * runtime row-group filters cover simple equi-joins when statistics
  * cooperate; this operator makes the same trick explicit, deterministic,
  * and available to any key expression.
  *
  * Hashing: `xxhash64(seed_i, key)` per probe — deterministic across runs,
  * and deliberately NOT the engine's sha-based portable family: the filter
  * never appears in any result (the oracle is the plain join), so it can
  * use the cheapest codegen'd hash Spark has. sha2 here would cost k
  * digest evaluations per fact row in the scan's hot loop for a property
  * (cross-engine reproducibility) nothing observes.
  */
object BloomPrune {

  /** Per-probe bit position of a key: `xxhash64(i, key) mod m` (pmod — the
    * raw hash is signed).
    *
    * CONTRACT: xxhash64 is input-TYPE-sensitive (INT 5 and BIGINT 5 hash
    * differently), so build-side and probe-side key columns must have the
    * same dataType or the filter produces false NEGATIVES. [[prunedJoin]]
    * enforces this by casting both sides to string when types differ;
    * callers of [[buildWords]]/[[mightContain]] directly own the same
    * obligation. */
  private def bitPos(keyCol: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(lit(i), keyCol), lit(mBits.toLong))

  /** Build the filter's 64-bit words distributed-side: explode each key's
    * `k` bit positions, OR-fold per word with a map-side-combined `bit_or`
    * groupBy, and collect only the m/64 words to the driver. */
  def buildWords(keys: DataFrame, keyCol: Column, mBits: Int = 1 << 20,
                 k: Int = 3): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    val positions = (0 until k).map(i => bitPos(keyCol, i, mBits))
    val words = keys
      .select(explode(array(positions: _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  private val singleBitMasks: Seq[Long] = (0 until 64).map(1L << _)

  /** The probe predicate: all `k` bits set. Pure literal-array lookups —
    * stays in whole-stage codegen and is pushed toward the scan. */
  def mightContain(keyCol: Column, words: Array[Long], k: Int = 3): Column = {
    val mBits = words.length * 64
    val wordsLit = typedlit(words.toSeq)
    val masksLit = typedlit(singleBitMasks)
    (0 until k).map { i =>
      val pos = bitPos(keyCol, i, mBits)
      val word = element_at(wordsLit, (shiftright(pos, 6) + 1).cast("int"))
      val mask = element_at(masksLit, ((pos % 64) + 1).cast("int"))
      word.bitwiseAND(mask) =!= 0
    }.reduce(_ && _)
  }

  /** Exact equi-join with the big side Bloom-pruned first. Result is
    * identical to `big.join(small, bigKey === smallKey, "inner")` — the
    * filter only removes rows the join would drop anyway. */
  def prunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    // xxhash64 is type-sensitive: an INT build key and BIGINT probe key hash
    // to different bits, silently dropping matching rows. Same-type keys take
    // the zero-cost path; mixed types canonicalize both sides to string.
    val sameType = big.schema(bigKey).dataType == small.schema(smallKey).dataType
    val buildKey = if (sameType) col(smallKey) else col(smallKey).cast("string")
    val probeKey = if (sameType) col(bigKey) else col(bigKey).cast("string")
    val words = buildWords(small, buildKey, mBits, k)
    big.filter(mightContain(probeKey, words, k))
      .join(small, col(bigKey) === col(smallKey))
  }
}
