"""Checkpoint/resume (SURVEY.md §5 item 5): stop after wave k, resume
from the snapshot checkpoint, and assert the final tables equal an
uninterrupted run's — plus snapshot time-travel on the TableIO layer."""

import pytest

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.fixtures.sitegen import SiteGenConfig, generate_site, site_to_spark
from librecrawl_spark.plans.crawl import CrawlEngine
from librecrawl_spark.storage.tableio import TableIO

SITE = SiteGenConfig(seed=21, n_hosts=3, pages_base_host=15, pages_other_host=4)
CFG = CrawlConfig(max_depth=3, max_urls=60, discover_sitemaps=False)


def mk_engine(spark, site, **kw):
    docs, hosts, _ = site_to_spark(spark, site)
    return CrawlEngine(spark, docs, hosts, site.base_url, CFG,
                       seed_urls=[s["url"] for s in site.seeds], **kw)


def snap(res):
    pages = sorted(
        (r["url"], r["seq"], r["status_code"], r["title"], r["word_count"])
        for r in res.pages.collect()
    )
    links = sorted(
        (r["source_url"], r["target_url"], r["target_status"])
        for r in res.links.collect()
    )
    seen = sorted((r["url"], r["seq"]) for r in res.seen.collect())
    return pages, links, seen


def test_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    site = generate_site(SITE)
    full = mk_engine(spark, site).run()

    ckdir = str(tmp_path / "ck")
    partial = mk_engine(spark, site, checkpoint_dir=ckdir, max_waves=2).run()
    assert partial.stats["crawled"] < full.stats["crawled"]

    resumed = mk_engine(spark, site, checkpoint_dir=ckdir).run()
    assert resumed.stats["resumed"] is True
    assert resumed.stats["crawled"] == full.stats["crawled"]
    assert snap(resumed) == snap(full)


def test_tableio_snapshot_time_travel(spark, tmp_path):
    tio = TableIO(str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    s0 = tio.commit("t1", df1, mode="append")
    s1 = tio.commit("t1", df2, mode="append")
    s2 = tio.commit("t1", df2, mode="overwrite")
    assert tio.read(spark, "t1", s0).count() == 2
    assert tio.read(spark, "t1", s1).count() == 3
    assert tio.read(spark, "t1", s2).count() == 1
    assert sorted(r["id"] for r in tio.read(spark, "t1", s1).collect()) == [1, 2, 3]


def test_tableio_empty_commit(spark, tmp_path):
    tio = TableIO(str(tmp_path / "e"))
    empty = spark.createDataFrame([], "id int, v string")
    sid = tio.commit("t", empty)
    out = tio.read(spark, "t", sid)
    assert out.count() == 0
    assert out.columns == ["id", "v"]
