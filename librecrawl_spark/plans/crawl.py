"""CrawlEngine — the per-wave driver loop (the engine's only imperative
component; everything inside a wave is a declarative DataFrame plan).

Spark lifecycle per wave (SURVEY.md §3 E1 equivalent):

    pending -> depth gate -> max_urls cut (seq order) -> politeness quota
    -> salted repartition -> fetch join -> extract (Arrow) -> explode
    links -> schedule_wave (dedup/trap/policy windows) -> next frontier

Ordering contract: the reference's concurrency-1 FIFO (deque popleft,
crawler.py:757-795 + link_manager.py:253-258) equals processing in
global discovery-sequence order, because every URL discovered while
processing wave k is appended after all wave-k URLs. Waves here are
contiguous ``seq`` ranges, so fetch order == deque order exactly.

Budget semantics: the reference stops submitting once crawled >=
max_urls (crawler.py:778-780,827-830) and discards over-depth pops
without consuming budget (crawler.py:788-790); reproduced by cutting
the wave at the seq of the remaining-budget-th depth-eligible row.

State (seen / pending / pattern_counts / traps) lives in DataFrames,
localCheckpoint'ed per wave to truncate lineage — on a cluster these
are the Iceberg-style snapshot tables (storage/tableio.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, functions as F

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.operators import extract as X, frontier as FR


@dataclass
class CrawlResult:
    pages: DataFrame
    links: DataFrame
    seen: DataFrame          # url, depth, seq (discovery order)
    traps: DataFrame         # signature/pattern, example_url, count
    lineage: list = field(default_factory=list)
    stats: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        hosts: DataFrame,
        base_url: str,
        config: CrawlConfig,
        seed_urls: list[str] | None = None,
        politeness: bool = False,
    ):
        self.spark = spark
        self.documents = documents
        self.hosts = hosts
        self.config = config.for_seed(base_url)
        self.base_url = base_url
        self.base_domain = urlparse(base_url).netloc
        self.seed_urls = seed_urls or [base_url]
        self.politeness = politeness

    def run(self) -> CrawlResult:
        spark = self.spark
        cfg = self.config

        fetch_map = X.resolve_redirects(X.http_meta(self.documents)).persist()
        fetch_map.count()

        # --- seed frontier (link_manager.add_url, dedup preserving order) --
        seed_rows, seed_seen = [], set()
        for u in self.seed_urls:
            if u not in seed_seen:
                seed_seen.add(u)
                seed_rows.append((u, 0, len(seed_rows), 0))
        pending = spark.createDataFrame(
            seed_rows, schema="url string, depth int, seq long, wave int"
        )
        seen = pending.select("url", "depth", "seq")
        counts = spark.createDataFrame([], schema="signature string, cnt long")
        traps = spark.createDataFrame(
            [], schema="signature string, example_url string, hits long, first_wave int"
        )
        empty_cand = spark.createDataFrame(
            [], schema=("clean_url string, link_idx int, signature string, host string, "
                        "src_url string, src_seq long, depth int"),
        )

        pages_parts: list[DataFrame] = []
        links_parts: list[DataFrame] = []
        sources_parts: list[DataFrame] = [empty_cand.select(
            F.col("clean_url").alias("target_url"), F.col("src_url").alias("source_url"))]
        lineage: list[dict] = []
        crawled = 0
        next_seq = len(seed_rows)
        wave = 0

        while crawled < cfg.max_urls:
            t0 = time.time()
            eligible = pending.filter(F.col("depth") <= cfg.max_depth)
            n_eligible = eligible.count()
            if n_eligible == 0:
                break
            remaining = cfg.max_urls - crawled
            fetch_n = min(remaining, n_eligible)
            cut_seq = (
                eligible.orderBy("seq").limit(fetch_n)
                .agg(F.max("seq")).collect()[0][0]
            )
            fetch_set = eligible.filter(F.col("seq") <= cut_seq)
            leftover = pending.filter(F.col("seq") > cut_seq)

            if self.politeness:
                fetch_set, deferred = FR.apply_politeness(
                    fetch_set, self.hosts, cfg.wave_seconds
                )
                leftover = leftover.unionByName(deferred)

            fetch_set = fetch_set.withColumn("wave", F.lit(wave))
            fetched = X.join_fetch(
                FR.salted_repartition(fetch_set, salt_buckets=cfg.host_salt_buckets),
                fetch_map, self.documents,
            )
            pages = X.extract_pages(
                fetched, self.base_domain,
                crawl_external=cfg.crawl_external, max_depth=cfg.max_depth,
            ).persist()
            n_fetched = pages.count()
            crawled += n_fetched

            # report links: dedup on (source,target) keeping first in doc
            # order (link_manager.py:189-195; pages are fetched once, so
            # within-page dedup == global dedup)
            wave_links = (
                pages.select("url", "seq", F.posexplode("links").alias("pos", "l"))
                .select("seq", "pos", "l.*")
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        FR.Window.partitionBy("source_url", "target_url").orderBy("pos")
                    ),
                )
                .filter("_rn = 1")
                .drop("_rn", "pos", "seq")
            )
            links_parts.append(wave_links)

            # frontier candidates (depth+1, extraction gate applied in UDF)
            cands = (
                pages.select(
                    F.col("url").alias("src_url"),
                    F.col("seq").alias("src_seq"),
                    (F.col("depth") + 1).alias("depth"),
                    F.explode("candidates").alias("c"),
                )
                .select("src_url", "src_seq", "depth", "c.*")
            )
            sources_parts.append(
                cands.select(F.col("clean_url").alias("target_url"),
                             F.col("src_url").alias("source_url"))
            )

            new_frontier, counts_delta, trap_hits, occ = FR.schedule_wave(
                cands, seen, counts, self.hosts, self.base_domain, cfg, next_seq,
            )
            new_frontier = new_frontier.withColumn("wave", F.lit(wave + 1)).persist()
            n_new = new_frontier.count()

            # state merges
            counts = (
                counts.join(counts_delta, "signature", "full_outer")
                .select(
                    "signature",
                    (F.coalesce("cnt", F.lit(0)) + F.coalesce("cnt_delta", F.lit(0))).alias("cnt"),
                )
            )
            traps = self._merge_traps(traps, trap_hits, wave)

            seen = seen.unionByName(new_frontier.select("url", "depth", "seq"))
            pending = leftover.unionByName(new_frontier)
            next_seq += n_new

            # truncate lineage each wave
            seen = seen.localCheckpoint(eager=True)
            pending = pending.localCheckpoint(eager=True)
            counts = counts.localCheckpoint(eager=True)
            traps = traps.localCheckpoint(eager=True)

            pages_parts.append(pages.drop("links", "candidates"))
            occ.unpersist()
            lineage.append({
                "wave": wave, "pending_in": n_eligible, "fetched": n_fetched,
                "new_frontier": n_new, "crawled_total": crawled,
                "wall_ms": round((time.time() - t0) * 1000, 1),
            })
            wave += 1
            if n_new == 0 and leftover.isEmpty():
                break

        # --- assemble outputs ------------------------------------------------
        pages_all = pages_parts[0]
        for p in pages_parts[1:]:
            pages_all = pages_all.unionByName(p)
        links_all = (
            links_parts[0] if links_parts
            else self.spark.createDataFrame([], schema=f"struct<{X.LINK_STRUCT}>")
        )
        for l in links_parts[1:]:
            links_all = links_all.unionByName(l)

        # J1: patch target_status from crawl results (link_manager.py:269-278)
        status_map = pages_all.select(
            F.col("url").alias("target_url"), F.col("status_code").alias("target_status")
        )
        links_all = links_all.join(status_map, "target_url", "left")

        # J2: linked_from — distinct sources per URL from both tracking paths
        # (link_manager.py:73-76 + :183-187), compared as sets
        sources_all = sources_parts[0]
        for s in sources_parts[1:]:
            sources_all = sources_all.unionByName(s)
        sources_all = sources_all.unionByName(
            links_all.select("target_url", "source_url")
        )
        linked_from = sources_all.groupBy("target_url").agg(
            F.sort_array(F.collect_set("source_url")).alias("linked_from")
        )
        pages_all = (
            pages_all.join(
                linked_from.withColumnRenamed("target_url", "url"), "url", "left"
            )
            .withColumn(
                "linked_from",
                F.coalesce("linked_from", F.array().cast("array<string>")),
            )
        )

        traps_out = traps.select(
            F.col("signature").alias("pattern"), "example_url",
            F.col("hits").alias("count"),
        )
        stats = {
            "discovered": next_seq,
            "crawled": crawled,
            "waves": wave,
        }
        return CrawlResult(pages_all, links_all, seen, traps_out, lineage, stats)

    @staticmethod
    def _merge_traps(traps_prev: DataFrame, trap_hits: DataFrame, wave: int) -> DataFrame:
        """Merge per-wave trap hits into cumulative trap state; the first
        trapped occurrence's URL stays the example (link_manager.py:92-99)."""
        delta = trap_hits.select(
            "signature", F.col("example_url").alias("new_example"),
            F.col("hits").alias("new_hits"), F.lit(wave).alias("new_wave"),
        )
        return (
            traps_prev.join(delta, "signature", "full_outer")
            .select(
                "signature",
                F.coalesce("example_url", "new_example").alias("example_url"),
                (F.coalesce("hits", F.lit(0)) + F.coalesce("new_hits", F.lit(0))).alias("hits"),
                F.coalesce("first_wave", "new_wave").alias("first_wave"),
            )
        )
