"""Sanity checks on the fixture generator + reference-transcription oracle."""

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.fixtures.sitegen import SiteGenConfig, generate_site
from librecrawl_spark.oracle.refcrawl import ReferenceCrawlOracle


def small_cfg(**over):
    base = dict(seed=42, n_hosts=4, pages_base_host=20, pages_other_host=5)
    base.update(over)
    return SiteGenConfig(**base)


def crawl_cfg(**over):
    base = dict(max_depth=3, max_urls=100, respect_robots=True,
                discover_sitemaps=False)
    base.update(over)
    return CrawlConfig(**base)


def run_oracle(site_cfg=None, cfg=None):
    site = generate_site(site_cfg or small_cfg())
    oracle = ReferenceCrawlOracle(site.documents, site.hosts, site.base_url, cfg or crawl_cfg())
    return site, oracle.run([s["url"] for s in site.seeds])


def test_sitegen_deterministic():
    a = generate_site(small_cfg())
    b = generate_site(small_cfg())
    assert a.documents == b.documents
    assert a.hosts == b.hosts


def test_oracle_basics():
    site, out = run_oracle()
    assert out["stats"]["crawled"] > 5
    urls = [p["url"] for p in out["pages"]]
    assert urls[0] == site.seeds[0]["url"]
    assert len(set(urls)) == len(urls)  # each URL fetched once
    # seen set is a superset of fetched
    seen_urls = {u for u, _ in out["seen"]}
    assert set(urls) <= seen_urls
    # no external pages fetched (crawl_external=False)
    for p in out["pages"]:
        host = p["url"].split("/")[2]
        assert host == "site0.example", p["url"]


def test_oracle_robots_disallow():
    # base host robots disallows /docs/
    _, out = run_oracle()
    for u, _ in out["seen"]:
        if u.startswith("https://site0.example/docs/"):
            raise AssertionError(f"robots-disallowed URL discovered: {u}")


def test_oracle_external_mode():
    _, closed = run_oracle(cfg=crawl_cfg(crawl_external=False))
    _, open_ = run_oracle(cfg=crawl_cfg(crawl_external=True, max_urls=200))
    hosts_closed = {p["url"].split("/")[2] for p in closed["pages"]}
    hosts_open = {p["url"].split("/")[2] for p in open_["pages"]}
    assert hosts_closed == {"site0.example"}
    assert len(hosts_open) > 1


def test_oracle_max_urls_budget():
    _, out = run_oracle(cfg=crawl_cfg(max_urls=7))
    assert out["stats"]["crawled"] == 7


def test_oracle_trap_detection():
    site_cfg = small_cfg(trap_pages=40)
    cfg = crawl_cfg(max_urls=500, trap_threshold=10)
    _, out = run_oracle(site_cfg, cfg)
    assert any(t["pattern"] == "/p/\\d+" for t in out["traps"])
    # trap pages fetched is bounded near the threshold
    trap_fetches = [u for u, _ in out["fetch_order"] if "/p/" in u]
    assert len(trap_fetches) <= 12


def test_oracle_redirects_and_errors():
    _, out = run_oracle()
    statuses = {p["status_code"] for p in out["pages"]}
    assert 200 in statuses
    redirected = [p for p in out["pages"] if p["redirect_count"] > 0]
    assert redirected, "fixture should contain followed redirects"
    for p in redirected:
        assert p["redirect_chain"][-1].get("final")


def test_oracle_word_count_and_extraction():
    _, out = run_oracle()
    ok = [p for p in out["pages"] if p["status_code"] == 200]
    assert any(p["title"] for p in ok)
    assert any(p["word_count"] > 100 for p in ok)
    assert any(p["canonical_url"] for p in ok)
    assert all(len(p["h2"]) <= 10 for p in ok)


def test_oracle_links_dedup_and_status_patch():
    _, out = run_oracle()
    keys = [(l["source_url"], l["target_url"]) for l in out["links"]]
    assert len(keys) == len(set(keys))
    patched = [l for l in out["links"] if l["target_status"] is not None]
    assert patched
