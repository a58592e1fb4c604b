package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial-URL pins for the curation family. Each case is an exact
  * expected canonical form — the cross-engine oracle covers the synthetic
  * fixture's branch mix; this spec covers the branches the fixture cannot
  * reach (IP hosts, scheme-less inputs, non-default-port pairings, bare
  * suffix hosts) plus the rollup's exact-branch arithmetic.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): (String, String, String) = {
    val r = UrlOps.normalizeUrls(Seq((1L, url)).toDF("id", "url"), "url")
      .select("url_norm", "host", "registrable_domain").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("full adversarial URL: case, userinfo, default port, tracking, fragment") {
    assert(norm("HTTPS://User:Pw@WWW.Example.CO.UK:443/Path/Page?utm_source=x&q=1&fbclid=abc#frag")
      === (("https://www.example.co.uk/Path/Page?q=1", "www.example.co.uk", "example.co.uk")))
  }

  test("non-default port pairings are KEPT (http:443, https:80, :8080)") {
    assert(norm("http://example.com:443/x")._1 === "http://example.com:443/x")
    assert(norm("https://example.com:80/x")._1 === "https://example.com:80/x")
    assert(norm("https://example.com:8080/x")._1 === "https://example.com:8080/x")
  }

  test("default ports dropped; empty path canonicalizes to /") {
    assert(norm("http://EXAMPLE.com:80")._1 === "http://example.com/")
    assert(norm("https://example.com:443")._1 === "https://example.com/")
  }

  test("scheme-less input normalizes host-relative (total pass, no nulls)") {
    assert(norm("example.com/a?ref=x") === (("example.com/a", "example.com", "example.com")))
  }

  test("tracking-only query drops the ? entirely; survivor order preserved") {
    assert(norm("https://x.io/?utm_source=a&utm_medium=b")._1 === "https://x.io/")
    assert(norm("http://a.b.co.jp/p?utm_campaign=1&b=2&a=3&gclid=z")._1
      === "http://a.b.co.jp/p?b=2&a=3")
  }

  test("registrable domain: multi-part TLD, plain TLD, bare suffix, single label, IP") {
    assert(norm("http://a.b.co.jp/p")._3 === "b.co.jp")
    assert(norm("http://www.example.com/")._3 === "example.com")
    assert(norm("http://co.uk/")._3 === "co.uk")
    assert(norm("http://localhost:8080/x")._3 === "localhost")
    assert(norm("http://192.168.0.1/x") === (("http://192.168.0.1/x", "192.168.0.1", "192.168.0.1")))
  }

  test("blockedFlag is a broadcast join flag, default false") {
    val df = Seq(("a.com", 1L), ("b.co.uk", 2L), ("c.org", 3L))
      .toDF("registrable_domain", "id")
    val bl = Seq("b.co.uk", "z.io").toDF("domain")
    val out = UrlOps.blockedFlag(df, "registrable_domain", bl)
      .select("id", "blocked").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("domainRollup exact branch: dup_factor counts duplicate content per domain") {
    val docs = Seq(
      ("a.com", "alpha beta"), ("a.com", "alpha beta"), ("a.com", "gamma"),
      ("b.com", "delta epsilon zeta")).toDF("registrable_domain", "text")
    val out = UrlOps.domainRollup(docs, "registrable_domain", "text", k = 64)
      .select("registrable_domain", "n_docs", "n_tokens", "n_mins",
        "distinct_content_est", "dup_factor_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a.com") === (("a.com", 3L, 5L, 2L, 2L, 1500000L)))
    assert(out("b.com") === (("b.com", 1L, 3L, 1L, 1L, 1000000L)))
  }

  test("urlDedup: longest text wins, ties to smallest id, n_dups counts the group") {
    val df = Seq(
      // one canonical URL, three fetches: 5-char, 9-char, 9-char texts
      (1L, "https://a.com/p", "short"),
      (2L, "https://a.com/p", "long text"),
      (3L, "https://a.com/p", "also long"),
      // singleton URL
      (9L, "https://b.com/q", "x")).toDF("doc_id", "url_norm", "text")
    val out = UrlOps.urlDedup(df, "url_norm", "doc_id", "text")
      .select("url_norm", "n_dups", "kept_doc_id", "kept_len")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("https://a.com/p") === (("https://a.com/p", 3L, 2L, 9L)),
      "9-char tie must elect the smaller id (2, not 3)")
    assert(out("https://b.com/q") === (("https://b.com/q", 1L, 9L, 1L)))
  }

  test("urlDedup election keeps map-side partial aggregation (partial agg below " +
    "the exchange)") {
    val df = Seq((1L, "u", "t")).toDF("doc_id", "url_norm", "text")
    // sparkPlan, not executedPlan: the AQE wrapper hides the inner tree
    // from collect() (round-10 s3 rule d) and aggregate MODES are fixed at
    // strategy time, before EnsureRequirements, so sparkPlan is the right
    // altitude for this pin.
    val plan = UrlOps.urlDedup(df, "url_norm", "doc_id", "text")
      .queryExecution.sparkPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a.aggregateExpressions
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a.aggregateExpressions
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a.aggregateExpressions
    }
    assert(aggs.flatten.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial),
      s"expected a Partial aggregate below the exchange, got:\n$plan")
  }

  test("crawlSchedule: per-domain slots ascend by id, cap drops the tail, " +
    "fetches spaced delaySec apart") {
    val df = Seq(
      ("a.com", 30L), ("a.com", 10L), ("a.com", 20L), ("a.com", 40L),
      ("b.com", 7L)).toDF("rd", "doc_id")
    val out = UrlOps.crawlSchedule(df, "rd", "doc_id",
        startTs = "2024-01-15 00:00:00", maxPerDomain = 3, delaySec = 5)
      .select("rd", "doc_id", "slot", "sched_s", "scheduled_at", "n_urls", "n_dropped")
      .as[(String, Long, Long, Long, String, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq === Seq(
      ("a.com", 10L, 0L, 0L), ("a.com", 20L, 1L, 5L), ("a.com", 30L, 2L, 10L),
      ("b.com", 7L, 0L, 0L)), "id-ascending slots, 40 dropped by the cap")
    assert(out.filter(_._1 == "a.com").forall(r => r._6 == 4L && r._7 == 1L))
    assert(out.filter(_._1 == "b.com").forall(r => r._6 == 1L && r._7 == 0L))
    assert(out.find(r => r._1 == "a.com" && r._3 == 2L).get._5
      === "2024-01-15 00:00:10", "politeness spacing lands in the timestamp")
  }

  test("crawlSchedule matches the window-based reference draw on randomized data " +
    "(bounded aggregate ≡ row_number semantics)") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 400).map { _ =>
      (s"d${rnd.nextInt(12)}.com", math.abs(rnd.nextLong()) % 100000L)
    }.distinct
    val df = rows.toDF("rd", "doc_id")
    val got = UrlOps.crawlSchedule(df, "rd", "doc_id",
        startTs = "2024-01-15 00:00:00", maxPerDomain = 5, delaySec = 7)
      .select("rd", "doc_id", "slot").as[(String, Long, Long)].collect().toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (rd, g) =>
      g.map(_._2).sorted.take(5).zipWithIndex.map { case (id, i) => (rd, id, i.toLong) }
    }.toSet
    assert(got === expect)
  }

  test("robotsFilter: longest-prefix override both directions, allow-on-tie, " +
    "whole-domain deny, no-rule default-allow") {
    val docs = Seq(
      (1L, "a.com", "/p/17"), // / allow, /p/1 deny, /p/17 allow → longest allow wins
      (2L, "a.com", "/p/12"), // / allow, /p/1 deny → longer deny beats root allow
      (3L, "a.com", "/q"),    // only / allow matches
      (4L, "b.com", "/p/4x"), // /p/4 deny + /p/4 allow tie → allow wins the tie
      (5L, "c.com", "/"),     // whole-domain deny
      (6L, "d.com", "/x")     // no rule at all → default allow, zero matched
    ).toDF("doc_id", "rd", "path")
    val rules = Seq(
      ("a.com", "/", true), ("a.com", "/p/1", false), ("a.com", "/p/17", true),
      ("b.com", "/p/4", false), ("b.com", "/p/4", true),
      ("c.com", "/", false)).toDF("domain", "path_prefix", "allow")
    val out = UrlOps.robotsFilter(docs, "doc_id", "rd", "path", rules)
      .select("doc_id", "allowed", "n_rules_matched")
      .as[(Long, Boolean, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(
      1L -> ((true, 3L)), 2L -> ((false, 2L)), 3L -> ((true, 1L)),
      4L -> ((true, 2L)), 5L -> ((false, 1L)), 6L -> ((true, 0L))))
  }

  test("robotsFilter ignores rules whose prefix exceeds the 5-digit pad bound " +
    "(mirrored in the llm_robots_filter oracle CTE)") {
    val docs = Seq((1L, "a.com", "/p")).toDF("doc_id", "rd", "path")
    val over = "/" + ("p" * 100001)
    val rules = Seq(("a.com", "/", false), ("a.com", over, true))
      .toDF("domain", "path_prefix", "allow")
    val out = UrlOps.robotsFilter(docs, "doc_id", "rd", "path", rules)
      .select("allowed", "n_rules_matched").as[(Boolean, Long)].collect()
    // the over-bound rule is dropped BEFORE matching: only the deny matches
    assert(out.toSeq === Seq((false, 1L)))
  }

  test("robotsFilter election keeps map-side partial aggregation and the rules " +
    "side broadcasts") {
    val docs = Seq((1L, "a.com", "/p")).toDF("doc_id", "rd", "path")
    val rules = Seq(("a.com", "/", true)).toDF("domain", "path_prefix", "allow")
    val plan = UrlOps.robotsFilter(docs, "doc_id", "rd", "path", rules)
      .queryExecution.sparkPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a.aggregateExpressions
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a.aggregateExpressions
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a.aggregateExpressions
    }
    assert(aggs.flatten.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial),
      s"expected a Partial aggregate below the exchange, got:\n$plan")
    val bcasts = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bcasts.nonEmpty, s"expected a broadcast join for the rules side, got:\n$plan")
  }

  test("normalizeUrls is map-only (no shuffle exchange in the plan)") {
    val df = graft.fixtures.Fixtures.urlDocs(
      Seq((1L, "t"), (2L, "t")).toDF("doc_id", "text"))
    val plan = UrlOps.normalizeUrls(df, "url").queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected map-only plan, got:\n$plan")
  }
}
