"""Native policy fast path == Python UDF (which itself transcribes
crawler.py:1425-1492) on every URL/robots shape, including the ones that
force the fallback. The native path must agree wherever it claims
eligibility; ineligible rows are exactly the ones the engine routes to
the UDF."""

import pytest
from pyspark.sql import functions as F

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.operators.frontier import (
    compile_robots_rules, make_policy_udf, native_policy_exprs)

BASE = "site0.example"

ROBOTS = {
    "site0.example": "User-agent: *\nDisallow: /private/\nAllow: /private/ok\nCrawl-delay: 2",
    "sub.site0.example": "User-agent: *\nDisallow: /",
    "other.example": "User-agent: *\nDisallow: *",      # urllib quotes to %2A: matches nothing
    "www.site0.example": "User-agent: bot\nDisallow: /x\n\nUser-agent: *\nAllow: /",
    "weird.example": "User-agent: *\nDisallow: /café/",  # non-safe prefix -> not simple
}

URLS = [
    "https://site0.example/",
    "https://site0.example/private/page",
    "https://site0.example/private/okthing",      # Allow wins (first match)
    "https://site0.example/PUBLIC/Page",
    "https://site0.example/file.PDF",
    "https://site0.example/archive.tar.gz",
    "https://site0.example/no-ext",
    "https://site0.example",                      # no path -> '/'
    "https://sub.site0.example/x",                # subdomain, disallow all
    "https://other.example/x",                    # external + dead '*' rule
    "https://www.site0.example/x",                # www-insensitive internal
    "https://site0.example/q?x=1&y=2",            # querystring -> fallback
    "https://site0.example/p%20q",                # %-escape -> fallback
    "https://site0.example/semi;colon",           # params char -> fallback
    "https://weird.example/café/x",          # non-simple rules -> fallback
    "https://missing.example/x",                  # no robots row -> allow
]


@pytest.mark.parametrize("cfg", [
    CrawlConfig(crawl_external=True, crawl_subdomains=True),
    CrawlConfig(crawl_external=False, crawl_subdomains=False),
    CrawlConfig(crawl_external=True, respect_robots=False),
    CrawlConfig(crawl_external=True, include_extensions=("html", "pdf")),
], ids=["open", "closed", "norobots", "include-ext"])
def test_native_agrees_with_udf(spark, cfg):
    hosts = spark.createDataFrame(
        [(h, t) for h, t in ROBOTS.items()], "host string, robots_txt string"
    )
    rules = compile_robots_rules(hosts, cfg.user_agent)
    df = spark.createDataFrame([(u,) for u in URLS], "clean_url string")
    df = df.withColumn("host", F.regexp_extract("clean_url", r"^https?://([^/]+)", 1))
    df = df.join(F.broadcast(hosts), "host", "left")
    df = df.join(F.broadcast(rules.drop("robots_txt")), "host", "left")

    eligible, m, native_ok = native_policy_exprs(F.col("clean_url"), BASE, cfg)
    udf = make_policy_udf(BASE, cfg)
    out = (
        df.withColumn("_m_", m)
        .withColumn("elig", eligible)
        .withColumn("native", native_ok)
        .withColumn("py", udf(F.col("clean_url"), F.col("robots_txt")))
        .collect()
    )
    for r in out:
        if r["elig"]:
            assert r["native"] == r["py"], (r["clean_url"], r["native"], r["py"])

    # the fallback-forcing URLs really are ineligible (unsafe URL chars,
    # or a host whose rule prefixes aren't quote-safe — urllib stores
    # 'Disallow: *' as '%2A', so other.example is conservatively routed
    # to the UDF too)
    by_url = {r["clean_url"]: r["elig"] for r in out}
    for u in URLS:
        if ("?" in u or "%" in u or ";" in u or "café" in u
                or "other.example" in u):
            assert not by_url[u], u
        else:
            assert by_url[u], u


def test_rule_extraction_shapes(spark):
    hosts = spark.createDataFrame(
        [("a", ROBOTS["site0.example"]), ("b", None), ("c", "")],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in compile_robots_rules(hosts, "UA").collect()}
    a = rows["a"]
    assert [(x["prefix"], x["allow"]) for x in a["rules"]] == [
        ("/private/", False), ("/private/ok", True)]
    assert a["simple"] is True
    assert rows["b"]["rules"] is None and rows["b"]["allow_all"]
    assert rows["c"]["rules"] == []  # empty robots: no entries -> allow


@pytest.mark.parametrize("cfg", [
    CrawlConfig(crawl_external=True, crawl_subdomains=True),
    CrawlConfig(crawl_external=False, crawl_subdomains=False),
    CrawlConfig(crawl_external=True, respect_robots=False),
    CrawlConfig(crawl_external=True, include_extensions=("html", "pdf")),
], ids=["open", "closed", "norobots", "include-ext"])
def test_fast_variant_agrees_with_udf(spark, cfg):
    """The single-rule codegen variant must agree with the UDF on every
    eligible row whose host has <= 1 robots rule (the subset
    schedule_wave routes to it)."""
    from librecrawl_spark.operators.frontier import native_policy_exprs_fast

    # single-rule robots shapes (plus missing/empty) for the fast path
    robots = {
        "site0.example": "User-agent: *\nDisallow: /private/",
        "sub.site0.example": "User-agent: *\nDisallow: /",
        "www.site0.example": "User-agent: *\nAllow: /",
        "empty.example": "",
    }
    hosts = spark.createDataFrame(
        [(h, t) for h, t in robots.items()], "host string, robots_txt string"
    )
    rules = compile_robots_rules(hosts, cfg.user_agent)
    urls = [
        "https://site0.example/",
        "https://site0.example/private/page",
        "https://site0.example/file.PDF",
        "https://site0.example/a.b.html",
        "https://site0.example",
        "https://sub.site0.example/x",
        "https://www.site0.example/x",
        "https://empty.example/x",
        "https://missing.example/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "clean_url string")
    df = df.withColumn("host", F.regexp_extract("clean_url", r"^https?://([^/]+)", 1))
    df = df.join(F.broadcast(hosts), "host", "left")
    df = df.join(F.broadcast(rules.drop("robots_txt")), "host", "left")

    eligible, m, fast_ok = native_policy_exprs_fast(F.col("clean_url"), BASE, cfg)
    udf = make_policy_udf(BASE, cfg)
    out = (
        df.withColumn("elig", eligible)
        .withColumn("single", F.coalesce("n_rules", F.lit(0)) <= 1)
        .withColumn("fast", fast_ok)
        .withColumn("py", udf(F.col("clean_url"), F.col("robots_txt")))
        .collect()
    )
    checked = 0
    for r in out:
        if r["elig"] and r["single"]:
            assert r["fast"] == r["py"], (r["clean_url"], r["fast"], r["py"])
            checked += 1
    assert checked >= 8  # every URL above is single-rule eligible


def test_parse_url_native_agrees_with_python(spark):
    """parse_url_native (the post-aggregate host/signature re-derivation
    in schedule_wave) must equal urlparse().netloc + urls.url_signature
    for every URL it claims parseable; gated-out rows are exactly the
    ones make_parse_url_udf completes."""
    from urllib.parse import urlparse

    from librecrawl_spark.functions import urls as U
    from librecrawl_spark.operators.frontier import (
        make_parse_url_udf, parse_url_native)

    urls = [
        # parseable, everyday shapes
        "https://site0.example/",
        "https://site0.example",
        "http://h1.example/a/b/c.html",
        "https://h.example/p/12345",
        "https://h.example/id/deadbeef-dead-beef-dead-beefdeadbeef/x",
        "https://h.example/mixed/AB12cd34",
        "https://h0.example:8080/port",
        "https://user@h0.example/userinfo",
        "https://h.example/UPPER/Case.HTML",
        "https://h.example/dot.in.path/v1.2.3",
        "https://h.example//double//slash",
        "https://h.example/trailing/",
        "ftp-like-but-not://x/y",              # not http(s) -> residue
        # residue shapes (gate must be False; Python side is the truth)
        "https://h.example/q?x=1",             # query
        "https://h.example/p%20q",             # %-escape
        "https://h.example/semi;colon",        # params
        "https://h.example/semi;colon/deeper", # ';' in middle segment
        "https://h.example/frag#f",            # fragment
        "https://h.example/café",         # non-ASCII path
        "https://café.example/x",         # non-ASCII host
        "HTTPS://h.example/upper-scheme",      # uppercase scheme
        "https://h.example?q=1",               # '?' before any '/'
        "https://h.example/spa ce",            # space
        "https:///x",                          # empty netloc
        "https://h.example/uuid/123e4567-e89b-12d3-a456-426614174000",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "clean_url string")
    par, netloc, sig = parse_url_native(F.col("clean_url"))
    pu = make_parse_url_udf()(F.col("clean_url"))
    rows = (
        df.select("clean_url", par.alias("par"), netloc.alias("h"),
                  sig.alias("s"), pu.alias("pu"))
        .collect()
    )
    n_par = 0
    for r in rows:
        u = r["clean_url"]
        want_h = urlparse(u).netloc
        want_s = U.url_signature(u)
        if r["par"]:
            n_par += 1
            assert r["h"] == want_h, (u, r["h"], want_h)
            assert r["s"] == want_s, (u, r["s"], want_s)
        # the residue UDF is the exact transcription for every row
        assert r["pu"]["host"] == want_h, (u, r["pu"]["host"], want_h)
        assert r["pu"]["signature"] == want_s, (u, r["pu"]["signature"], want_s)
    assert n_par >= 12  # the everyday shapes stay on the native path
    # shapes that MUST be gated out (urlparse semantics diverge from
    # the plain slice, or Python-only behavior is involved)
    gated = {u for u in urls
             if any(c in u for c in "?%;# ")
             or not u.startswith(("http://", "https://"))
             or any(ord(c) > 127 for c in u)}
    for r in rows:
        if r["clean_url"] in gated:
            assert not r["par"], r["clean_url"]
