"""Diagnostic for the approx-minhash banding flake: build the
test_issues `pages` fixture, print the titles + band arrays of the
pages that appear in dropped pairs, plus the candidate enumeration for
the blog/13 pair family. Run in any suspect session-state context."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.fixtures.sitegen import SiteGenConfig, generate_site, site_to_spark
from librecrawl_spark.operators import issues as I
from librecrawl_spark.plans.crawl import CrawlEngine
from librecrawl_spark.session import get_spark


def main():
    spark = get_spark("mh-debug", master="local[4]", shuffle_partitions=8)
    site = generate_site(SiteGenConfig(seed=42, n_hosts=4, pages_base_host=18,
                                       pages_other_host=5))
    docs, hosts, _ = site_to_spark(spark, site)
    res = CrawlEngine(spark, docs, hosts, site.base_url,
                      CrawlConfig(max_depth=3, max_urls=100,
                                  discover_sitemaps=False),
                      seed_urls=[s["url"] for s in site.seeds]).run()
    pg = res.pages.persist()

    d = pg.select(
        "url",
        F.lower(F.trim(F.coalesce("title", F.lit("")))).alias("t"),
    ).filter(F.length("t") > 0)
    sh = F.expr("transform(sequence(1, greatest(length(t) - 2, 1)),"
                " i -> substr(t, i, 3))")
    mk = lambda pref: (lambda s: F.md5(F.concat(F.lit(pref), s)))  # noqa: E731
    sigs = [F.array_min(F.transform(sh, mk(f"{p}:"))) for p in range(8)]
    bands = [F.md5(F.concat(sigs[2 * k], sigs[2 * k + 1])) for k in range(4)]
    rows = (d.withColumn("mh", F.array(*bands))
            .filter(F.col("url").rlike("blog/13|blog/16|blog/1$|blog/10|"
                                       "page/15|example/$|segment-12"))
            .orderBy("url").collect())
    for r in rows:
        print(r["url"])
        print("   t =", repr(r["t"]))
        print("   mh =", [v[:8] for v in r["mh"]])

    exact = {(r["url_a"], r["url_b"])
             for r in I.duplicate_content_pairs(pg).collect()}
    approx = {(r["url_a"], r["url_b"])
              for r in I.duplicate_content_pairs(pg, approx_minhash=True).collect()}
    print("exact - approx:", sorted(exact - approx))
    print("approx - exact:", sorted(approx - exact))
    print("n_exact", len(exact), "n_approx", len(approx))


if __name__ == "__main__":
    main()
