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
