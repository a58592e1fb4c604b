package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssembleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, 10L + (i % 37))).toDF("id", "toks")

  test("hashOrderedCumSum is bucket-count independent (the scalable decomposition " +
    "reproduces the global prefix sum)") {
    val df = docs(500)
    def run(buckets: Int) =
      Assemble.hashOrderedCumSum(df, "id", col("toks"), "s8", buckets)
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val coarse = run(4)       // ~125 rows per bucket
    val fine = run(4096)      // mostly 0/1 rows per bucket
    assert(coarse == fine, "cum must not depend on the bucket decomposition")
    // and it matches the direct single-window reference
    val ref = df
      .withColumn("k", Assemble.shuffleKey($"id", "s8"))
      .withColumn("cum", sum($"toks").over(
        org.apache.spark.sql.expressions.Window.orderBy($"k", $"id")))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(coarse == ref, "bucketed sum must equal the global-window reference")
  }

  test("hashOrderedCumSum partitionCols: per-group sums in one pass are " +
    "bit-identical to separate per-group calls (the llm_manifest_diff fusion)") {
    val df = docs(500).withColumn("grp", pmod($"id", lit(10)) === 0)
    val fused = Assemble.hashOrderedCumSum(df, "id", col("toks"), "s8",
        partitionCols = Seq("grp"))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val separate = Seq(true, false).flatMap { g =>
      Assemble.hashOrderedCumSum(df.filter($"grp" === g), "id", col("toks"), "s8")
        .select($"id", $"cum").as[(Long, Long)].collect()
    }.toMap
    assert(fused == separate,
      "partitioned cumsum must equal filtering + the unpartitioned form per group")
  }

  test("shuffledOrder is a dense 0-based permutation, stable across runs, " +
    "and relative order survives data growth") {
    val df = docs(300).select($"id")
    val p1 = Assemble.shuffledOrder(df, "id").select($"id", $"shuffle_pos")
      .as[(Long, Long)].collect().toMap
    assert(p1.values.toSeq.sorted == (0L until 300L), "dense permutation")
    val p2 = Assemble.shuffledOrder(df, "id").select($"id", $"shuffle_pos")
      .as[(Long, Long)].collect().toMap
    assert(p1 == p2, "deterministic")
    // growth: positions shift, relative order of surviving rows does not
    val grown = docs(600).select($"id")
    val p3 = Assemble.shuffledOrder(grown, "id").select($"id", $"shuffle_pos")
      .as[(Long, Long)].collect().toMap
    val oldOrder = p1.toSeq.sortBy(_._2).map(_._1)
    val newOrder = p3.toSeq.sortBy(_._2).map(_._1).filter(p1.contains)
    assert(oldOrder == newOrder, "relative order is content-addressed")
  }

  test("unimaxAllocation: capped prefix takes its cap, the rest share equally, " +
    "hand-computed across all three regimes") {
    // two docs per stratum; avails a=100 b=200 c=1000 d=5000, epochs 2.0
    // -> caps a=200 b=400 c=2000 d=10000
    val docs = Seq(("a", 60L), ("a", 40L), ("b", 150L), ("b", 50L),
      ("c", 900L), ("c", 100L), ("d", 4000L), ("d", 1000L)).toDF("src", "n")
    def run(budget: Long) =
      Assemble.unimaxAllocation(docs, "src", "n", budget, epochsMilli = 2000L)
        .select($"src", $"avail_tokens", $"cap_tokens", $"alloc_tokens", $"epochs_milli")
        .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // mixed: a,b,c capped; d gets the remainder 5000-2600=2400
    val mixed = run(5000L)
    assert(mixed("a") == (("a", 100L, 200L, 200L, 2000L)))
    assert(mixed("b") == (("b", 200L, 400L, 400L, 2000L)))
    assert(mixed("c") == (("c", 1000L, 2000L, 2000L, 2000L)))
    assert(mixed("d") == (("d", 5000L, 10000L, 2400L, 480L)))
    assert(mixed.values.map(_._4).sum == 5000L, "mixed regime spends the budget exactly")
    // epoch-bound: budget exceeds every cap -> all capped, budget under-spent
    val bound = run(20000L)
    assert(bound.values.forall(r => r._4 == r._3), "all strata at their cap")
    assert(bound.values.map(_._4).sum == 12600L)
    // scarce: budget below the smallest cap-claim -> all share equally
    val scarce = run(400L)
    assert(scarce.values.forall(_._4 == 100L), "uniform fair share")
  }

  test("shardPlan: offsets bounded by the budget, starts partition the token " +
    "stream contiguously, shard totals ≈ budget") {
    val budget = 500L
    val plan = Assemble.shardPlan(docs(400), "id", "toks", budget, "sh")
      .select($"id", $"toks", $"shard_id", $"shard_offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(plan.forall(_._4 < budget), "offset < budget")
    assert(plan.forall(_._4 >= 0), "offset >= 0")
    // every shard except possibly the last overflows its budget only by the
    // one document straddling the boundary
    val totals = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = plan.map(_._2).max
    val lastShard = totals.keys.max
    totals.foreach { case (sid, tot) =>
      if (sid != lastShard)
        assert(tot >= budget - maxDoc && tot < budget + maxDoc,
          s"shard $sid total $tot vs budget $budget (maxDoc $maxDoc)")
    }
    // shards are contiguous runs: ids sorted by (key, id) have monotone shard_id
    val byOrder = Assemble.hashOrderedCumSum(docs(400), "id", col("toks"), "sh")
      .select($"id", $"cum").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    val shardOf = plan.map(p => p._1 -> p._3).toMap
    val seq = byOrder.map(shardOf)
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b }, "monotone shards")
  }

  test("targetMixResample: binding source kept whole, no source exceeds its " +
    "target, unweighted sources dropped") {
    // availability 300/150/60; weights 2/1/1 → fr-analog (c) binds:
    // N = 60*4 div 1 = 240, targets = 120/60/60
    val rows = (1 to 300).map(i => (i.toLong, "a")) ++
      (301 to 450).map(i => (i.toLong, "b")) ++
      (451 to 510).map(i => (i.toLong, "c")) ++
      (511 to 520).map(i => (i.toLong, "junk"))
    val df = rows.toDF("id", "src")
    val out = Assemble.targetMixResample(df, "src", "id",
      Seq("a" -> 2L, "b" -> 1L, "c" -> 1L))
    val kept = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("junk"), "unweighted source dropped")
    assert(kept("c") == 60, "binding source kept whole (keep_ppm = 1e6)")
    val planCols = out.select($"src", $"avail", $"target_n", $"keep_ppm")
      .distinct().as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(planCols("a") == (("a", 300L, 120L, 400000L)), s"plan a: ${planCols("a")}")
    assert(planCols("b") == (("b", 150L, 60L, 400000L)), s"plan b: ${planCols("b")}")
    assert(planCols("c") == (("c", 60L, 60L, 1000000L)), s"plan c: ${planCols("c")}")
    // hash cut approximates the target without ever exceeding availability;
    // the deviation is binomial in the (fixed, deterministic) hash draw —
    // bound it at ~4σ of Binomial(avail, keep_ppm/1e6), floor 10
    kept.foreach { case (s, n) =>
      val (_, avail, target, ppm) = planCols(s)
      assert(n <= avail, s"$s kept $n > avail $avail")
      val p = ppm / 1e6
      val tol = math.max(10L, math.ceil(4 * math.sqrt(avail * p * (1 - p))).toLong)
      assert(math.abs(n - target) <= tol, s"$s kept $n vs target $target (tol $tol)")
    }
  }

  test("temperatureWeight: floor-composed powers are exact against BigInt " +
    "references across the alpha grid") {
    val rnd = new scala.util.Random(31)
    val ns = (Seq(1L, 2L, 3L, 4L, 16L, 81L, 6241L) ++
      (1 to 100).map(_ => 1L + math.abs(rnd.nextLong()) % 4000000000000L)).distinct
    def bigIsqrt(n: Long): Long =
      java.math.BigInteger.valueOf(n).sqrt().longValue()
    val df = ns.toDF("n").select($"n",
      Assemble.temperatureWeight($"n", 0).as("w0"),
      Assemble.temperatureWeight($"n", 250).as("w250"),
      Assemble.temperatureWeight($"n", 500).as("w500"),
      Assemble.temperatureWeight($"n", 750).as("w750"),
      Assemble.temperatureWeight($"n", 1000).as("w1000"))
    df.collect().foreach { r =>
      val n = r.getLong(0)
      assert(r.getLong(1) == 1L)
      assert(r.getLong(2) == bigIsqrt(bigIsqrt(n)), s"w250($n)")
      assert(r.getLong(3) == bigIsqrt(n), s"w500($n)")
      assert(r.getLong(4) == bigIsqrt(n * bigIsqrt(n)), s"w750($n)")
      assert(r.getLong(5) == n)
    }
    intercept[IllegalArgumentException](Assemble.temperatureWeight(lit(1L), 300))
  }

  test("temperatureSample: plan arithmetic exact, cap branch binds, alpha " +
    "flattens the head, membership stable under appends") {
    // skewed strata: a 600, b 150, c 24 (a perfect square to pin boundaries)
    val rows = (1 to 600).map(i => ("a", i.toLong)) ++
      (1 to 150).map(i => ("b", 1000L + i)) ++ (1 to 24).map(i => ("c", 2000L + i))
    val df = rows.toDF("lang", "id")
    val out = Assemble.temperatureSample(df, "lang", "id", budgetDocs = 300L)
    val plan = out.select($"lang", $"n_docs", $"w_alpha", $"target_n", $"keep_ppm")
      .distinct().as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // w = isqrt(n): a→24, b→12, c→4; Σw = 40
    // targets: a = 300·24/40 = 180, b = 300·12/40 = 90, c = 300·4/40 = 30
    // c's target 30 > avail 24 → capped at 24 (keep_ppm = 1e6, kept whole)
    assert(plan("a") == ((600L, 24L, 180L, 300000L)), s"a: ${plan("a")}")
    assert(plan("b") == ((150L, 12L, 90L, 600000L)), s"b: ${plan("b")}")
    assert(plan("c") == ((24L, 4L, 24L, 1000000L)), s"c: ${plan("c")}")
    val kept = out.select($"id").as[Long].collect().toSet
    assert((2001L to 2024L).forall(kept), "capped stratum is kept whole")
    // α=0.5 flattens: the low-resource stratum's kept SHARE must exceed its
    // raw share, the head's must shrink (the point of temperature sampling)
    val keptA = kept.count(_ <= 600).toDouble
    assert(keptA / kept.size < 600.0 / 774.0, "head share must shrink")
    // proportional α=1 cuts every stratum at ~budget/N (exactly the integer
    // formula with w = n; truncation leaves small strata a few ppm short)
    val prop = Assemble.temperatureSample(df, "lang", "id", 300L, alphaMilli = 1000)
      .select($"n_docs", $"keep_ppm").distinct().as[(Long, Long)].collect()
    prop.foreach { case (n, ppm) =>
      val expect = (300L * n / 774L) * 1000000L / n
      assert(ppm == expect, s"alpha=1 ppm for n=$n: $ppm vs $expect")
    }
    // appending a new stratum never flips existing membership
    val grown = rows ++ (1 to 300).map(i => ("d", 3000L + i))
    val kept2 = Assemble.temperatureSample(grown.toDF("lang", "id"), "lang", "id",
        budgetDocs = 300L)
      .select($"id").as[Long].collect().toSet
    // plans change (Σw grew) so targets shrink; but membership within a
    // stratum is a hash-prefix cut: surviving ids must be a SUBSET
    assert(kept2.filter(_ < 3000L).subsetOf(kept),
      "shrinking keep_ppm under the same salt keeps a prefix of the old draw")
  }

  test("shardManifest checksum detects membership and content drift") {
    val base = Seq((1L, 5L, 0L, "alpha"), (2L, 5L, 0L, "beta"), (3L, 5L, 1L, "gamma"))
      .toDF("id", "toks", "shard_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      Assemble.shardManifest(df, "shard_id", "id", "toks",
          Assemble.contentChecksumTerm(col("text")))
        .select($"shard_id", $"n_docs", $"shard_tokens", $"content_sum")
        .as[(Long, Long, Long, Long)].collect().toSet
    val m1 = m(base)
    assert(m1 == m(base), "deterministic")
    val contentDrift = base.withColumn("text",
      when($"id" === 2L, lit("beta!")).otherwise($"text"))
    assert(m1 != m(contentDrift), "byte change must change the checksum")
    val membershipDrift = base.filter($"id" =!= 2L)
    assert(m1 != m(membershipDrift), "membership change must change the manifest")
  }

  test("manifestDiff classifies added/removed/changed/unchanged with exact deltas") {
    def m(rows: Seq[(Long, Long, Long, String)]) =
      Assemble.shardManifest(rows.toDF("id", "toks", "shard_id", "text"),
        "shard_id", "id", "toks", Assemble.contentChecksumTerm(col("text")))
    val old = m(Seq((1L, 5L, 0L, "alpha"), (2L, 7L, 1L, "beta"), (3L, 9L, 2L, "gamma")))
    val neu = m(Seq((1L, 5L, 0L, "alpha"),              // shard 0 untouched
      (2L, 7L, 1L, "beta!"),                            // shard 1: byte drift
      (4L, 11L, 3L, "delta")))                          // shard 2 gone, 3 new
    val d = Assemble.manifestDiff(old, neu).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(0L) == (("unchanged", 0L, 0L)))
    assert(d(1L) == (("changed", 0L, 0L)), "same counts, different bytes")
    assert(d(2L) == (("removed", -1L, -9L)))
    assert(d(3L) == (("added", 1L, 11L)))
  }

  test("compactionPlan: full shards pass through, small shards pack under 2x target") {
    // target 100: shards 0,1 full; 2..7 small with a boundary-straddler
    val manifest = Seq(
      (0L, 150L), (1L, 100L),
      (2L, 40L), (3L, 40L), (4L, 40L), // group 0: 40+40+40 = 120 (straddles)
      (5L, 90L),                       // pre 120 -> group 1
      (6L, 30L), (7L, 10L)             // pre 210, 240 -> group 2
    ).toDF("shard_id", "shard_tokens")
    val got = Assemble.compactionPlan(manifest, "shard_id", "shard_tokens", 100L)
      .as[(Long, Long, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got(0L)._3 && got(0L)._4 == 0L && !got(1L)._3 && got(1L)._4 == 1L,
      "full shards untouched, merge_group = own id")
    val groups = got.values.filter(_._3).groupBy(_._4)
      .view.mapValues(_.map(_._2).sum).toMap
    // packed group ids are negative — disjoint from pass-through ids, so
    // merge_group alone is a safe grouping key (shard 0's pass-through
    // group 0 must never collide with the first packed group)
    assert(groups == Map(-1L -> 120L, -2L -> 90L, -3L -> 40L), s"got $groups")
    val allGroups = got.values.map(g => (g._3, g._4)).toSeq
    assert(allGroups.filter(_._1).map(_._2).toSet
      .intersect(allGroups.filterNot(_._1).map(_._2).toSet).isEmpty,
      "packed and pass-through merge_group id spaces must be disjoint")
    // every merge group strictly under 2x target
    assert(groups.values.forall(_ < 200L))
    // deterministic: same input -> same plan
    val again = Assemble.compactionPlan(manifest, "shard_id", "shard_tokens", 100L)
      .as[(Long, Long, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("budgetSelect equals the global-window greedy prefix; all-fits and " +
    "empty edges hold") {
    // scores collide heavily (5 buckets) so the boundary bucket is wide
    val scored = (1 to 200).map(i =>
        (i.toLong, (i % 5).toLong, 10L + (i % 7))).toDF("id", "s", "t")
    def reference(budget: Long): Set[(Long, Long, Long)] = {
      val rows = scored
        .withColumn("hk", Assemble.shuffleKey($"id", "budget"))
        .as[(Long, Long, Long, Long)].collect()
        .sortBy { case (id, s, _, hk) => (-s, hk, id) }
      var cum = 0L
      rows.flatMap { case (id, s, t, _) =>
        cum += t
        if (cum <= budget) Some((id, s, t)) else None
      }.toSet
    }
    for (budget <- Seq(0L, 137L, 500L, 1000L)) {
      val got = Assemble.budgetSelect(scored, "id", "s", "t", budget)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == reference(budget), s"budget=$budget")
    }
    // randomized budgets hit arbitrary boundary offsets
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val budget = rnd.nextInt(2600).toLong
      val got = Assemble.budgetSelect(scored, "id", "s", "t", budget)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == reference(budget), s"random budget=$budget")
    }
    // all-fits: the whole corpus comes back
    val all = Assemble.budgetSelect(scored, "id", "s", "t", 1000000L)
      .as[(Long, Long, Long)].collect()
    assert(all.length == 200)
    // empty input: empty output with the right schema
    val none = Assemble.budgetSelect(scored.filter(lit(false)), "id", "s", "t", 10L)
    assert(none.collect().isEmpty && none.columns.toSeq == Seq("id", "score", "n_tokens"))
  }

  test("zoneMap: range layout shows tight spans, interleaved layout full spans") {
    // keys 0..99; range shards = contiguous tens; "shuffled" shards =
    // key % 10 (every shard spans nearly the whole key space)
    val rows = (0L until 100L).flatMap(k =>
      Seq(("range", k / 10, k), ("mod", k % 10, k)))
      .toDF("layout", "shard_id", "k")
    val got = Assemble.zoneMap(rows, Seq("layout", "shard_id"), "k")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size == 20)
    (0L until 10L).foreach { s =>
      val (_, _, n, lo, hi, ppm) = got(("range", s))
      assert(n == 10L && lo == s * 10 && hi == s * 10 + 9)
      assert(ppm == 9L * 1000000L / 99L, "span 9 of global 99")
      val (_, _, nm, lom, him, ppmM) = got(("mod", s))
      assert(nm == 10L && lom == s && him == 90 + s)
      assert(ppmM == 90L * 1000000L / 99L, "interleaved shards span ~everything")
    }
  }
}
