package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV: exact when distinct < k, estimator within theory bound when over") {
    // 2000 values over 800 distinct ids in group 'big'; 10 distinct in 'small'
    val df = ((1 to 2000).map(i => ("big", (i % 800).toString)) ++
      (1 to 50).map(i => ("small", (i % 10).toString)))
      .toDF("g", "v")
    val outMap = Sketches.kmvDistinct(df, Seq("g"), DedupOps.hash60($"v"), k = 64)
      .select($"g", $"n_mins", $"distinct_est").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(outMap("small") == ((10, 10L)), "under-k group must be exact")
    val (nBig, estBig) = outMap("big")
    assert(nBig == 64)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert(math.abs(estBig - 800.0) / 800.0 < 0.5, s"estimate $estBig too far from 800")
  }

  test("KMV: estimate is independent of partitioning (partial merge correct)") {
    val df = (1 to 5000).map(i => ("g", (i % 1234).toString)).toDF("g", "v")
    val est1 = Sketches.kmvDistinct(df.repartition(1), Seq("g"), DedupOps.hash60($"v"))
      .select($"distinct_est").as[Long].head()
    val est16 = Sketches.kmvDistinct(df.repartition(16), Seq("g"), DedupOps.hash60($"v"))
      .select($"distinct_est").as[Long].head()
    assert(est1 == est16, "merging k-min sets across partitions must be lossless")
  }

  test("KMV: plan aggregates partially below the exchange (bounded shuffle)") {
    val df = (1 to 100).map(i => ("g", i.toString)).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, Seq("g"), DedupOps.hash60($"v"))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // pass before the shuffle: at most k longs per (partition, group) move.
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert("partial_kmv_mins|partial kmv_mins|Partial".r.findFirstIn(plan).isDefined,
      s"expected a partial aggregation mode in:\n$plan")
  }

  test("quantileSample: exact quantiles when n < k, sampled quantiles are " +
    "members and partition-independent when over") {
    // n=20 < k: degrades to exact rank-selection quantiles
    val small = (1 to 20).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v")
    val exact = Sketches.quantileSample(small, $"v", $"id", Seq(25, 50, 75, 90), k = 256)
      .select($"q", $"value", $"sample_n").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // ceil(25*20/100)=5 -> 50, ceil(50*20/100)=10 -> 100, 15 -> 150, 18 -> 180
    assert(exact == Map(25L -> (50L, 20L), 50L -> (100L, 20L),
      75L -> (150L, 20L), 90L -> (180L, 20L)))
    // n=5000 > k=64: sample membership is content-addressed -> the estimate
    // is identical at any partitioning, and within sampling error of truth
    val big = (1 to 5000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    def run(parts: Int) =
      Sketches.quantileSample(big.repartition(parts), $"v", $"id", Seq(50), k = 64)
        .select($"value").as[Long].head()
    val p1 = run(1); val p16 = run(16)
    assert(p1 == p16, "bottom-k-by-hash sample must be partition-independent")
    assert(math.abs(p1 - 2500.0) / 2500.0 < 0.5,
      s"median estimate $p1 outside sampling-error band of 2500")
  }

  test("CMS: estimates only overcount, exact when width avoids collisions") {
    // 3 tokens with known counts, width 512 → collisions vanishingly unlikely
    val df = (Seq.fill(100)("alpha") ++ Seq.fill(40)("beta") ++ Seq.fill(7)("gamma"))
      .toDF("tok").withColumn("_h", DedupOps.hash60($"tok"))
    val cms = Sketches.cmsSketch(df, Nil, $"_h")
    val got = df.groupBy($"tok").agg(min($"_h").as("_h"), count(lit(1)).as("exact"))
      .crossJoin(cms)
      .withColumn("est", Sketches.cmsEstimate($"_h", $"cms"))
      .select($"tok", $"exact", $"est").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (tok, (exact, est)) =>
      assert(est >= exact, s"$tok: CMS must never undercount")
      assert(est == exact, s"$tok: no collisions expected at this width")
    }
  }

  test("CMS: weighted update grid is bit-identical to unit updates (r18)") {
    // occurrence rows vs the (value, count) pre-aggregate through the
    // weighted child — same grid, every cell
    val occ = (1 to 3000).map(i => (i % 97).toString).toDF("tok")
      .withColumn("_h", DedupOps.hash60($"tok"))
    val unit = Sketches.cmsSketch(occ, Nil, $"_h", depth = 4, width = 64)
      .select($"cms").as[Seq[Long]].head()
    val pre = occ.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("_h", DedupOps.hash60($"tok"))
    val weighted = Sketches.cmsSketch(pre, Nil, $"_h", depth = 4, width = 64,
        weightCol = Some($"cnt"))
      .select($"cms").as[Seq[Long]].head()
    assert(unit == weighted)
    // null weight rows contribute nothing (matches the null-hash rule)
    val withNull = pre.unionByName(
      Seq(("ghost", Option.empty[Long])).toDF("tok", "cnt")
        .withColumn("_h", DedupOps.hash60($"tok")))
    val wn = Sketches.cmsSketch(withNull, Nil, $"_h", depth = 4, width = 64,
        weightCol = Some($"cnt"))
      .select($"cms").as[Seq[Long]].head()
    assert(wn == weighted)
  }

  test("CMS: grid is independent of partitioning and sums to depth*N") {
    val df = (1 to 3000).map(i => (i % 97).toString).toDF("tok")
      .withColumn("_h", DedupOps.hash60($"tok"))
    val g1 = Sketches.cmsSketch(df.repartition(1), Nil, $"_h", depth = 4, width = 64)
      .select($"cms").as[Seq[Long]].head()
    val g16 = Sketches.cmsSketch(df.repartition(16), Nil, $"_h", depth = 4, width = 64)
      .select($"cms").as[Seq[Long]].head()
    assert(g1 == g16, "element-wise merge must be order/partition independent")
    (0 until 4).foreach { d =>
      assert(g1.slice(d * 64, (d + 1) * 64).sum == 3000L,
        s"depth row $d must count every input exactly once")
    }
  }

  test("CMS: negative hashes (xxhash64 SQL use) index correctly, estimate agrees") {
    val df = spark.sql(
      "SELECT xxhash64(CAST(id % 7 AS STRING)) AS h FROM range(700)")
    val cms = Sketches.cmsSketch(df, Nil, $"h", depth = 4, width = 64)
    val grid = cms.select($"cms").as[Seq[Long]].head()
    (0 until 4).foreach(d => assert(grid.slice(d * 64, (d + 1) * 64).sum == 700L,
      s"depth $d must count all rows — negative buckets would corrupt rows"))
    val est = df.distinct().crossJoin(cms)
      .select(Sketches.cmsEstimate($"h", $"cms", depth = 4, width = 64))
      .as[Long].collect()
    assert(est.forall(_ >= 100L), "each of 7 values occurs 100x; min cell >= exact")
  }

  test("cms_counts is callable from SQL and plans a partial ObjectHashAggregate") {
    val df = spark.sql(
      "SELECT cms_counts(CAST(id % 5 AS BIGINT), 2, 8) AS cms FROM range(1000)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    val grid = df.select(explode($"cms")).as[Long].collect()
    assert(grid.length == 16 && grid.sum == 2000L)
  }

  test("topK: k best distinct pairs, deterministic ties, partition-invariant") {
    val df = Seq(
      ("g", 50L, 7L), ("g", 50L, 3L),   // score tie → smaller id first
      ("g", 90L, 1L), ("g", 10L, 9L),
      ("g", 90L, 1L),                   // exact dup pair → counted once
      ("h", 5L, 2L)
    ).toDF("grp", "s", "i")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.topK(d, Seq("grp"), $"s", $"i", 3)
        .as[(String, Long, Long, Long)].collect().toSet
    val got = run(df)
    assert(got == Set(
      ("g", 1L, 90L, 1L), ("g", 2L, 50L, 3L), ("g", 3L, 50L, 7L),
      ("h", 1L, 5L, 2L)))
    assert(run(df.repartition(7)) == got, "merge across partitions is lossless")
  }

  test("topk_pairs plans a partial ObjectHashAggregate (bounded shuffle)") {
    val df = (1 to 100).map(i => ("g", i.toLong, i.toLong)).toDF("grp", "_s", "_i")
    val plan = df.groupBy($"grp").agg(expr("topk_pairs(_s, _i, 5)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial"),
      s"expected partial ObjectHashAggregate in:\n$plan")
  }

  test("kmv_mins is callable from SQL via the session extensions") {
    val out = spark.sql(
      "SELECT kmv_mins(h, 4) AS mins FROM (SELECT CAST(id * 10 AS BIGINT) AS h FROM range(100))")
      .select(explode($"mins")).as[Long].collect()
    assert(out.toSeq == Seq(0L, 10L, 20L, 30L), "k smallest distinct hashes, ascending")
  }
}
