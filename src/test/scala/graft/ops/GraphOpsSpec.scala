package graft.ops

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrenceEdges: canonical pairs, support counts, min-support pruning") {
    // baskets: t10 {1,2,3} (with a dup item row), t11 {1,2}, t12 {2,3,4}, t13 {1,2}
    val fact = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L), (12L, 4L),
      (13L, 1L), (13L, 2L)
    ).toDF("txn", "item")
    val all = GraphOps.coOccurrenceEdges(fact, "txn", "item", minSupport = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (2L, 4L, 1L), (3L, 4L, 1L)),
      "distinct items per txn, pa<pb canonical, support = #txns containing both")
    val backbone = GraphOps.coOccurrenceEdges(fact, "txn", "item", minSupport = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(backbone == Set((1L, 2L, 3L), (2L, 3L, 2L)), "support-2 backbone only")
  }

  test("mega-basket guard: oversized baskets never pair, small ones unaffected") {
    // basket 1 = 5 items (over cap 4), basket 2+3 = the same small pair twice
    val rows = (1 to 5).map(i => (1L, i.toLong)) ++
      Seq((2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L))
    val got = GraphOps.coOccurrenceEdges(rows.toDF("txn", "item"),
        "txn", "item", minSupport = 1, maxBasket = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 11L, 2L)), "the 5-item basket contributes no pairs")
    // supports/n_tx still count the dropped basket (pairing-only guard)
    val rules = GraphOps.associationRules(rows.toDF("txn", "item"),
        "txn", "item", minSupport = 1, maxBasket = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rules.map(r => (r._1, r._2)).toSet == Set((10L, 11L), (11L, 10L)))
    assert(rules.forall(_._7 == (2L * 1000000L / 2L) * 3L / 2L),
      "lift denominator n_tx = 3 includes the dropped basket")
  }

  test("triangleSummary: K4 → 4 nodes, 6 edges, 4 wedges, 4 triangles") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("pa", "pb")
    val r = GraphOps.triangleSummary(edges)
      .as[(Long, Long, Long, Long)].head()
    // all degrees 3 → rank order = id order; out-degrees 3,2,1,0 →
    // wedges C(3,2)+C(2,2) = 4, all of which close.
    assert(r == ((4L, 6L, 4L, 4L)))
  }

  test("triangleSummary: triangle-free bipartite graph → 0 triangles") {
    val edges = (for (a <- 1L to 4L; b <- 11L to 14L) yield (a, b)).toDF("pa", "pb")
    val r = GraphOps.triangleSummary(edges).as[(Long, Long, Long, Long)].head()
    assert(r._1 == 8L && r._2 == 16L && r._4 == 0L)
    assert(r._3 > 0L, "K4,4 has wedges, just none that close")
  }

  test("backbone components: two cliques stay separate, sizes exact") {
    // two K3s and one isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("pa", "pb")
    import org.apache.spark.sql.functions.{col, count, lit}
    val comps = DedupOps.connectedComponents(edges, "pa", "pb")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(comps == Set((1L, 3L), (10L, 3L), (20L, 2L)))
  }

  test("associationRules: hand-exact confidence and lift, truncation asymmetry") {
    // baskets: {1,2}, {1,2}, {1,2,3}, {2,3}, {3} → n_tx=5,
    // n(1)=3, n(2)=4, n(3)=3; support-2 pairs: (1,2):3, (2,3):2
    val fact = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (3L, 3L),
      (4L, 2L), (4L, 3L), (5L, 3L)
    ).toDF("txn", "item")
    val got = GraphOps.associationRules(fact, "txn", "item", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 3L, 3L, 4L, 10000L, 1250000L),
      (2L, 1L, 3L, 4L, 3L, 7500L, 1250000L),
      (2L, 3L, 2L, 4L, 3L, 5000L, 833333L),
      // division-first truncation: (2e6 // 3) * 5 // 4 = 833332, not the
      // symmetric 833333 — the documented exact-integer trade-off
      (3L, 2L, 2L, 3L, 4L, 6666L, 833332L)))
  }

  test("associationRulesOnBaskets over pre-built basket/backbone tables " +
    "equals the default path (the session-persisted fixture contract)") {
    val fact = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (3L, 3L),
      (4L, 2L), (4L, 3L), (5L, 3L)
    ).toDF("txn", "item")
    val baskets = GraphOps.basketTable(fact, "txn", "item")
    val edges = GraphOps.edgesFromBaskets(baskets, minSupport = 2)
    val viaFixtures = GraphOps.associationRulesOnBaskets(baskets, edges)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val direct = GraphOps.associationRules(fact, "txn", "item", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(viaFixtures == direct)
  }

  test("degree-ordered count equals brute-force triple enumeration (randomized)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 25
      val edgeList = (for {
        a <- 1 to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.18
      } yield (a.toLong, b.toLong)).toVector
      val adj = edgeList.toSet
      val expected = (for {
        x <- 1 to n; y <- (x + 1) to n; z <- (y + 1) to n
        if adj((x.toLong, y.toLong)) && adj((x.toLong, z.toLong)) && adj((y.toLong, z.toLong))
      } yield 1).size.toLong
      val r = GraphOps.triangleSummary(edgeList.toDF("pa", "pb"))
        .as[(Long, Long, Long, Long)].head()
      assert(r._4 == expected, s"trial $trial: ${r._4} vs brute-force $expected")
      assert(r._2 == edgeList.size.toLong)
    }
  }

  test("pageRank: hand-exact two-node exchange, dangling sink, dst-only nodes " +
    "in the node set, mass conservation") {
    import spark.implicits._
    // a -> b (2 edges), b -> a (1), a -> c (1), b -> d (1): c has no
    // out-edges (dangling), d appears ONLY as a dst (dst-only, dangling)
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("b", "d"))
      .toDF("s", "t")
    val ranks = GraphOps.pageRank(edges, "s", "t", iters = 8)
      .as[(String, Long)].collect().toMap
    assert(ranks.keySet == Set("a", "b", "c", "d"),
      "dst-only node d must be in the node set")
    // b takes 2/3 of a's mass, c 1/3 — b must outrank c; a is b's main
    // target (1/2 of b) plus base, outranking both sinks
    assert(ranks("b") > ranks("c"))
    assert(ranks("a") > ranks("c"))
    // ppm mass approximately conserved (truncating div loses < n ppm/round)
    val total = ranks.values.sum
    assert(total > 990000L && total <= 1000000L, s"mass $total")
    // driver-reference cross-check against an independent double-precision
    // power iteration, tolerance = the documented integer truncation slack
    val nodes = Seq("a", "b", "c", "d")
    val cnt = Map(("a", "b") -> 2.0, ("b", "a") -> 1.0, ("a", "c") -> 1.0,
      ("b", "d") -> 1.0)
    val out = Map("a" -> 3.0, "b" -> 2.0)
    var r = nodes.map(_ -> 0.25).toMap
    (1 to 8).foreach { _ =>
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val contrib = cnt.collect { case ((f, t), c) if t == v => r(f) * c / out(f) }.sum
        v -> (0.15 / 4 + 0.85 * (contrib + dang / 4))
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(ranks(v) - r(v) * 1e6) < 2000,
        s"$v: ${ranks(v)} ppm vs reference ${(r(v) * 1e6).toLong}")
    }
  }

  /** The driver and distributed paths are identical integer arithmetic by
    * design, so path equality is pinned bit-exact and the dispatch flip is
    * pinned STRUCTURALLY (r12 rule b: a behavioral flip fixture cannot
    * exist when the approximation error is zero): the driver path's plan
    * bottoms out in a LocalRelation (toDF of driver rows), the distributed
    * path in the checkpoint's LogicalRDD. */
  private def prPlanIsDriverLocal(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])

  test("pageRank dispatch: driver ≡ distributed bit-exact, flip at the cap boundary") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("b", "d"))
      .toDF("s", "t") // 4 DISTINCT (s,t) edges after aggregation
    def run(cap: Int) = GraphOps.pageRank(edges, "s", "t", iters = 8, edgeCap = cap)
    val atCap = run(4)       // 4 distinct edges ≤ cap → driver path
    val overCap = run(3)     // cap+1 probe returns 4 > 3 → distributed
    val forced = run(0)      // 0 disables the driver path outright
    assert(prPlanIsDriverLocal(atCap), "cap ≥ |E| must take the driver path")
    assert(!prPlanIsDriverLocal(overCap), "cap < |E| must take the distributed path")
    assert(!prPlanIsDriverLocal(forced), "edgeCap = 0 must force the distributed path")
    val d = atCap.as[(String, Long)].collect().toMap
    assert(overCap.as[(String, Long)].collect().toMap == d,
      "the two engine paths must be bit-identical")
    assert(forced.as[(String, Long)].collect().toMap == d)
  }

  test("pageRank distributed: bit-equal to driver on a graph with multi-edges, " +
    "dangling sinks, dst-only nodes, and skewed out-degrees") {
    // deterministic LCG-ish graph: 40 nodes, 300 edge draws with repeats;
    // nodes n30..n39 never appear as src → dangling at the gate
    val raw = (0 until 300).map { i =>
      val s = (i * 17 + 3) % 30
      val t = (i * 29 + 11) % 40
      (s"n$s", s"n$t")
    }.filter { case (a, b) => a != b }
    val edges = raw.toDF("s", "t")
    val driver = GraphOps.pageRank(edges, "s", "t", iters = 8, edgeCap = 100000)
      .as[(String, Long)].collect().toMap
    val dist = GraphOps.pageRank(edges, "s", "t", iters = 8, edgeCap = 0)
      .as[(String, Long)].collect().toMap
    assert(driver == dist, "truncating-integer rounds must agree node for node")
    assert(driver.keySet == raw.flatMap(e => Seq(e._1, e._2)).toSet)
    val total = dist.values.sum
    assert(total > 990000L && total <= 1000000L, s"mass $total")
  }
}
