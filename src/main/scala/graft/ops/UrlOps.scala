package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation — the crawl-side stage a C4/FineWeb-class corpus
  * runs BEFORE any text pass (Raffel et al. 2020 §2.2 dedups and filters by
  * URL; Penedo et al. 2024 §3.1 applies URL blocklists first because a
  * dropped URL never costs a text decode).
  *
  * Everything here is map-only string work per row plus ONE
  * registrable-domain-bounded aggregation ([[domainRollup]]): at 100 TB the
  * normalization adds no shuffle, the blocklist is a broadcast join (real
  * blocklists are ~1M rows ≪ autoBroadcast), and the rollup's group count
  * is the web's registrable-domain count (~100M s), far under the corpus
  * row count, with KMV bounded sketch state (k longs) per group instead of
  * a corpus-scale count-distinct.
  *
  * Parsing is deliberately REGEX-ONLY (no java.net.URI, no parse_url):
  * every pattern is RE2-safe (no lookaround / backreferences), so the
  * DuckDB oracle replays each step verbatim and the two engines cannot
  * disagree on edge cases. The tracking-parameter strip is a single flat
  * codegen regexp_replace over the whole query string (repo rule: flat
  * whole-string ops beat per-element HOF lambdas for string rewriting).
  *
  * Measured (r13): do NOT fuse a heavy synthesized-URL expression into
  * the normalize stage — the ScaleSmoke fixture's ~30-when synthesis plus
  * this file's ~10 regexes in one whole-stage-codegen method exceeds the
  * JIT size limit and the stage runs interpreted: 12-18 s fused vs ~2 s
  * with the (doc_id, url) projection materialized first, per 100k rows,
  * same JVM, both orders. Real inputs read `url` from storage, which IS
  * the split shape; anything that derives URLs inline should checkpoint
  * the narrow projection before calling [[normalizeUrls]].
  */
object UrlOps {

  /** Query parameters that carry tracking state, not content identity
    * (the C4 / common crawl-cleaning set). Kept as an alternation SOURCE
    * string so the Spark pass and the DuckDB oracle interpolate the
    * identical pattern. */
  val TrackingParamRe: String =
    "(utm_[a-z_]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)"

  /** Suffix-list-lite: common multi-part public suffixes. A full public
    * suffix list is ~9k rows and would ride the same literal-IN /
    * broadcast shape; this subset keeps the oracle SQL readable while
    * exercising every branch of the label logic. */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in", "co.nz", "org.nz",
    "com.br", "com.mx", "com.ar", "com.cn", "com.sg", "com.tr", "com.hk",
    "co.za", "co.kr", "com.tw")

  /** Demo blocklist for the registry query (production blocklists arrive
    * as a table and ride [[blockedFlag]]'s broadcast join unchanged). */
  val DemoBlocklist: Seq[String] =
    Seq("site13.com", "site7.co.uk", "site40.org", "site2.de", "spam.example")

  /** Demo robots rules for the registry query: (domain, path_prefix,
    * allow). Domains/paths are chosen against the `doc_id % 125` residue
    * fixture (the llm_url_dedup collision trick, r13 rule e: the fixture
    * must COLLIDE with the rules or the interesting branches never reach
    * the gate — under the residue, site17.de carries /p/17, site12.io
    * /p/12, site4.com.au /p/4, site7.com /p/7, all present from sf0.01's
    * 500 docs up). Exercises longest-match override in both directions
    * (site17.de: /p/17 allow beats /p/1 deny beats / allow → allowed;
    * site12.io: /p/1 deny beats / allow → denied), the allow-on-tie rule
    * via a duplicate-length pair (site4.com.au), whole-domain deny
    * (site7.com), and the no-rule default-allow everywhere else.
    * Mirror: the VALUES CTE in llm_robots_filter — keep in lock-step. */
  val DemoRobots: Seq[(String, String, Boolean)] = Seq(
    ("site17.de", "/", true), ("site17.de", "/p/1", false),
    ("site17.de", "/p/17", true),
    ("site12.io", "/", true), ("site12.io", "/p/1", false),
    ("site4.com.au", "/p/4", false), ("site4.com.au", "/p/4", true),
    ("site7.com", "/", false))

  /** Parse `urlCol` into `_sch` (lowercased scheme, '' when absent),
    * `_host` (lowercased, userinfo stripped), `_port` (string, '' when
    * absent), `_path` (raw, '' when absent) and `_qraw` (query string
    * without '?', '' when absent). Stage-by-stage selects keep each regex
    * single-evaluated: CollapseProject does not inline multi-referenced
    * non-cheap projections (measured round 7), so `_rest`/`_auth` etc.
    * are computed once per row even though later stages reference them
    * repeatedly. Fragment is dropped here (never part of the resource). */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame =
    df
      .withColumn("_u1", regexp_replace(trim(col(urlCol)), "#.*$", ""))
      .withColumn("_schRaw",
        regexp_extract(col("_u1"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
      .withColumn("_rest",
        when(col("_schRaw") =!= "", expr("substring(_u1, length(_schRaw) + 4)"))
          .otherwise(col("_u1")))
      .withColumn("_auth", regexp_extract(col("_rest"), "^([^/?]*)", 1))
      .withColumn("_pathq", expr("substring(_rest, length(_auth) + 1)"))
      .withColumn("_hostport", regexp_replace(col("_auth"), "^[^@]*@", ""))
      .withColumn("_portS", regexp_extract(col("_hostport"), ":([0-9]+)$", 1))
      .withColumn("_sch", lower(col("_schRaw")))
      .withColumn("_host", lower(
        when(col("_portS") =!= "",
          expr("substring(_hostport, 1, length(_hostport) - length(_portS) - 1)"))
          .otherwise(col("_hostport"))))
      .withColumn("_path", regexp_extract(col("_pathq"), "^([^?]*)", 1))
      .withColumn("_qraw",
        when(length(col("_pathq")) > length(col("_path")),
          expr("substring(_pathq, length(_path) + 2)"))
          .otherwise(lit("")))
      .withColumn("_port",
        when(col("_portS") === "", lit(""))
          .when(col("_sch") === "http" && col("_portS") === "80", lit(""))
          .when(col("_sch") === "https" && col("_portS") === "443", lit(""))
          .otherwise(col("_portS")))
      .drop("_u1", "_schRaw", "_rest", "_auth", "_pathq", "_hostport", "_portS")

  /** Tracking-parameter strip as ONE flat regexp_replace: prefix the query
    * with '&' so every parameter (including the first) matches the same
    * '&name=value' shape, delete tracking pairs globally; the caller drops
    * the '&' sentinel with a substring in a SEPARATE projection stage so
    * the regex evaluates once per row. Parameter ORDER of the survivors is
    * preserved (C4 does not re-sort; re-sorting would merge fewer
    * duplicates than it would corrupt signed URLs). */
  def cleanQueryMarked(qraw: Column): Column =
    regexp_replace(concat(lit("&"), qraw), s"&$TrackingParamRe=[^&]*", "")

  /** Canonical URL: lowercased scheme/host, userinfo and fragment dropped,
    * default port dropped (http:80 / https:443 — a NON-default pairing
    * like http:443 is kept), tracking params dropped, empty path
    * canonicalized to '/'. Scheme-less inputs normalize scheme-less
    * (host-relative), so the pass is total. Adds `url_norm`, `host`,
    * `registrable_domain`; map-only. */
  def normalizeUrls(df: DataFrame, urlCol: String): DataFrame =
    withUrlParts(df, urlCol)
      .withColumn("_qcm", cleanQueryMarked(col("_qraw")))
      .withColumn("_qc", expr("substring(_qcm, 2)"))
      .withColumn("url_norm", concat(
        when(col("_sch") === "", lit("")).otherwise(concat(col("_sch"), lit("://"))),
        col("_host"),
        when(col("_port") === "", lit("")).otherwise(concat(lit(":"), col("_port"))),
        when(col("_path") === "", lit("/")).otherwise(col("_path")),
        when(col("_qc") === "", lit("")).otherwise(concat(lit("?"), col("_qc")))))
      .withColumn("host", col("_host"))
      .withColumn("registrable_domain", registrableDomain(col("_host")))
      .drop("_sch", "_host", "_port", "_path", "_qraw", "_qcm", "_qc")

  /** eTLD+1 under [[MultiPartTlds]]: last 3 labels when the last 2 form a
    * multi-part suffix, else last 2, else the host itself. IPv4-ish hosts
    * (digits and dots only) pass through whole — their "last two labels"
    * would be a nonsense octet pair. Branch conditions guard every
    * `element_at` so the expression is ANSI-safe on short hosts. */
  def registrableDomain(host: Column): Column = {
    val labs = split(host, "\\.")
    val n = size(labs)
    val last2 = concat(element_at(labs, -2), lit("."), element_at(labs, -1))
    when(host.rlike("^[0-9.]+$"), host)
      .when(n >= 3 && last2.isin(MultiPartTlds: _*),
        concat(element_at(labs, -3), lit("."), last2))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Broadcast blocklist flag: `blocked` true when `domCol` appears in
    * `blocklist`'s `domain` column. A left broadcast join, not an isin
    * literal, because production blocklists (~1M domains) arrive as a
    * table; the join stays map-only under broadcast at any corpus size. */
  def blockedFlag(df: DataFrame, domCol: String, blocklist: DataFrame): DataFrame = {
    val bl = blocklist.select(col("domain").as("_bl_domain"))
      .withColumn("_bl_hit", lit(true))
    df.join(broadcast(bl), df(domCol) === bl("_bl_domain"), "left")
      .withColumn("blocked", coalesce(col("_bl_hit"), lit(false)))
      .drop("_bl_domain", "_bl_hit")
  }

  /** Election key for [[urlDedup]]: zero-padded "(text length, inverted
    * id)" string, so a plain max_by picks the LONGEST text and breaks ties
    * on the SMALLEST id — the llm_mixed_lang lpad trick, which keeps
    * map-side partial aggregation in BOTH engines (DuckDB `arg_max`
    * rejects struct ordering keys, so a struct tie-break could not be
    * replayed; a packed `len·C + id` integer is banned by the repo's
    * orientation-packing rule). Bounds: text length < 10⁹ chars, id <
    * 10¹³ — both documented engine-wide. */
  private def electionKey(idCol: String, textCol: String): Column =
    concat(lpad(length(col(textCol)).cast("string"), 9, "0"),
      lpad((lit(9999999999999L) - col(idCol)).cast("string"), 13, "0"))

  /** URL-level exact dedup — the crawl stage C4/FineWeb run FIRST: multiple
    * fetches of one canonical URL (recrawls, mirror params, case variants)
    * collapse to a single elected document before any text pass pays for
    * the duplicates. One hash-keyed groupBy on `urlNormCol` (linear, the
    * same shape as exact text dedup); the winner is the longest text, ties
    * to the smallest id — deterministic and map-side-partial via
    * [[electionKey]]. Output: one row per canonical URL with the elected
    * doc, its length, and the fetch multiplicity (`n_dups` — the recrawl
    * signal a frontier scheduler feeds back on). */
  def urlDedup(df: DataFrame, urlNormCol: String, idCol: String,
               textCol: String): DataFrame =
    df.groupBy(col(urlNormCol))
      .agg(count(lit(1)).as("n_dups"),
        max_by(col(idCol), electionKey(idCol, textCol)).as("kept_doc_id"),
        max(length(col(textCol))).cast("long").as("kept_len"))

  /** Politeness-scheduled crawl frontier: per registrable domain, order
    * candidate URLs by ascending id (the frontier priority), keep at most
    * `maxPerDomain`, and space fetches `delaySec` apart from `startTs` —
    * the per-domain rate limit every crawler owes origin servers, fused
    * with the FineWeb-style per-domain URL cap.
    *
    * Scale shape: the slot assignment is a BOUNDED native aggregate
    * (`topk_pairs` on negated id — k pairs of state per (partition,
    * domain), map-side combined) + a posexplode of the k-length winner
    * array, so slots never touch a window: [[Sampling.stratifiedQuota]]'s
    * row_number shape would shuffle and sort EVERY candidate URL of every
    * domain, while this ships k pairs per domain regardless of how hot the
    * domain is — there is no skew, because a million-URL domain and a
    * ten-URL domain both put at most k rows on the wire. The DuckDB oracle
    * replays the semantics as the row_number window it is equivalent to
    * (slot < k over id-ascending order), so the two engines cross-check
    * each other's strategy. */
  def crawlSchedule(df: DataFrame, domCol: String, idCol: String,
                    startTs: String, maxPerDomain: Int = 8,
                    delaySec: Int = 5): DataFrame = {
    require(maxPerDomain >= 1, "maxPerDomain must be positive")
    require(delaySec >= 0, "delaySec must be non-negative")
    df.groupBy(col(domCol))
      .agg(count(lit(1)).as("n_urls"),
        expr(s"topk_pairs(-$idCol, $idCol, $maxPerDomain)").as("_top"))
      .select(col(domCol), col("n_urls"),
        greatest(col("n_urls") - lit(maxPerDomain.toLong), lit(0L)).as("n_dropped"),
        posexplode(col("_top")))
      .select(col(domCol), col("n_urls"), col("n_dropped"),
        col("col.id").as(idCol), col("pos").cast("long").as("slot"))
      .withColumn("sched_s", col("slot") * lit(delaySec.toLong))
      .withColumn("scheduled_at", date_format(
        timestamp_seconds(
          unix_seconds(to_timestamp(lit(startTs))) + col("sched_s")),
        "yyyy-MM-dd HH:mm:ss"))
  }

  /** Robots-style path exclusion with longest-prefix-match semantics (the
    * Google robots.txt resolution rule: the most specific — longest —
    * matching rule wins; on a length tie, allow beats deny; no matching
    * rule means allowed). Rules arrive as a table
    * (domain, path_prefix, allow) and broadcast — a real robots corpus is
    * rules-per-domain-bounded, far under the broadcast budget.
    *
    * The winner election rides a zero-padded (prefix length, allow-bit)
    * string key under plain max_by — map-side partials in both engines,
    * and the exact shape DuckDB's arg_max can replay (it rejects struct
    * ordering keys; r13 rule a). Both engines skip null ordering keys, so
    * unmatched URLs fall through the SAME coalesce(default-allow) path.
    * Join is broadcast-hash on the domain equi-key with the prefix test
    * as the join filter — map-only at any corpus size. Prefix length
    * bound: < 100000 chars (the 5-digit pad — Spark AND DuckDB lpad both
    * TRUNCATE over-length strings, so an over-bound prefix would silently
    * misorder the longest-match election; 5 digits clears any real-world
    * robots.txt line by orders of magnitude, and the bound is enforced,
    * not assumed; the llm_robots_filter oracle mirrors the same
    * `length(path_prefix) < 100000` predicate on its rules CTE so a
    * pathological rule set cannot diverge the two engines). */
  def robotsFilter(df: DataFrame, idCol: String, domCol: String,
                   pathCol: String, rules: DataFrame): DataFrame = {
    val r = rules.select(col("domain").as("_rd"),
      col("path_prefix").as("_pp"), col("allow").as("_al"))
      // enforce the pad bound instead of assuming it: lpad TRUNCATES an
      // over-length length-string, which would misorder the election
      .filter(length(col("_pp")) < 100000)
    val key = concat(lpad(length(col("_pp")).cast("string"), 5, "0"),
      when(col("_al"), lit("1")).otherwise(lit("0")))
    df.join(broadcast(r),
        df(domCol) === col("_rd") && col(pathCol).startsWith(col("_pp")), "left")
      .groupBy(col(idCol), col(domCol), col(pathCol))
      .agg(coalesce(max_by(col("_al"), key), lit(true)).as("allowed"),
        count(col("_pp")).as("n_rules_matched"))
  }

  /** Per-registrable-domain curation rollup: document count, token count,
    * and a KMV distinct-content estimate in ONE domain-keyed aggregation
    * (count/sum partials plus the k-long `kmv_mins` sketch state — never a
    * corpus-scale count-distinct shuffle). `dup_factor_ppm` =
    * docs·10⁶ div distinct-content — the domain-level duplication signal
    * FineWeb uses to drop template farms. Exact below k distinct hashes
    * (the sketch IS the set); saturated sketches use the (k−1)·2⁶⁰/kth-min
    * estimator computed DIVISION-FIRST in int64 — `2⁶⁰ div (kth div (k−1))`
    * with a floor-1 guard on the inner div (round-10 rule d: the product
    * form overflows int64 once k reaches 256, and float math has no place
    * in a value the oracle hashes) — the same form as
    * [[graft.streaming.StreamingStats.snapshot]]. */
  def domainRollup(df: DataFrame, domCol: String, textCol: String,
                   k: Int = 64): DataFrame = {
    require(k >= 2, "kmv k must be >= 2")
    val based = TextOps.withNormToks(df.select(col(domCol), col(textCol)), textCol)
    val nTok = when(length(col("_norm")) === 0, 0L)
      .otherwise(size(col("_toks")).cast("long"))
    based
      .select(col(domCol), nTok.as("_nt"),
        DedupOps.hash60(col(textCol)).as("_h"))
      .groupBy(col(domCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"),
        expr(s"kmv_mins(_h, $k)").as("_mins"))
      .withColumn("n_mins", size(col("_mins")).cast("long"))
      .withColumn("distinct_content_est", Sketches.kmvEstimate("_mins", k))
      .withColumn("dup_factor_ppm",
        expr("n_docs * 1000000 div distinct_content_est"))
      .drop("_mins")
  }
}
