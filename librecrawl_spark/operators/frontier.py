"""Frontier scheduling — the relational re-expression of LibreCrawl's
``LinkManager.extract_links`` gate sequence (link_manager.py:43-118):

    special-scheme skip -> absolutize/clean -> self-link skip ->
    seen-set dedup -> trap gate -> policy callback -> enqueue (FIFO)

The reference runs this per link under a lock; here each gate is a
DataFrame stage, and the *sequential* trap/count semantics are
reproduced exactly with window functions (see ``schedule_wave`` for the
derivation). Crawl ordering contract (SURVEY.md §2.5 W1 / §7 risks 1-2):
the engine reproduces the reference's concurrency-1 FIFO order via a
global discovery sequence ``seq`` assigned in (source page seq,
intra-page link index) order.

Scale notes
-----------
- seen-set dedup is a left-anti join on the exact stored URL (the
  reference's set-membership contract), pre-filtered by a broadcast
  Bloom filter at scale (``bloom_prefilter``): bloom "unseen" rows skip
  the shuffle join entirely; only "maybe seen" rows verify exactly —
  the false-positive-safe composition.
- global sequence assignment never single-partitions: range-partition by
  the order key, count per partition, broadcast prefix offsets, assign
  in one mapInPandas pass (``add_global_seq``).
- per-host politeness quotas + salted repartition break hot-host skew
  (``apply_politeness`` / ``salted_repartition``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import BooleanType

from librecrawl_spark.config import CrawlConfig

CAND_COLS = ("clean_url", "link_idx", "signature", "host", "src_url", "src_seq", "depth")


# --------------------------------------------------------------------------
# global sequence assignment (no single-partition window)
# --------------------------------------------------------------------------

def add_global_seq(df: DataFrame, order_cols: list[str], start: int,
                   out_col: str = "seq") -> DataFrame:
    """Assign a contiguous global sequence ``start, start+1, ...`` in
    ``order_cols`` order without ever collapsing to one partition:
    range-partition on the key, count rows per partition, broadcast the
    prefix-sum offsets, then number locally in one Arrow pass."""
    spark = df.sparkSession
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["count"] for r in part.groupBy("_pid").count().collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in part.schema.fields
              if f.name != "_pid"]
    out_schema = ", ".join(fields + [f"{out_col} long"])

    def assign(batches):
        local = None
        for pdf in batches:
            if local is None and len(pdf):
                local = b_offsets.value.get(int(pdf["_pid"].iloc[0]), start)
            if not len(pdf):
                continue
            out = pdf.drop(columns=["_pid"])
            out[out_col] = range(local, local + len(pdf))
            local += len(pdf)
            yield out

    result = part.mapInPandas(assign, schema=out_schema)
    return result


# --------------------------------------------------------------------------
# policy (robots + scope + extension + patterns) — Arrow UDF
# --------------------------------------------------------------------------

def make_policy_udf(base_domain: str, config: CrawlConfig):
    """Vectorized policy gate. Exact ``_should_crawl_url`` semantics
    (crawler.py:1425-1492) including robots (RobotFileParser per distinct
    robots.txt body, cached per batch; unreadable => allow,
    crawler.py:1543-1546). One Arrow batch = thousands of URLs per
    Python invocation."""
    cfg = dict(
        crawl_external=config.crawl_external,
        crawl_subdomains=config.crawl_subdomains,
        include_extensions=tuple(config.include_extensions),
        exclude_extensions=tuple(config.exclude_extensions),
        include_patterns=tuple(config.include_patterns),
        exclude_patterns=tuple(config.exclude_patterns),
    )
    respect_robots = config.respect_robots
    user_agent = config.user_agent

    @F.pandas_udf(BooleanType())
    def policy_ok(url: pd.Series, robots_txt: pd.Series) -> pd.Series:
        import urllib.robotparser

        from librecrawl_spark.functions import urls as U

        parsers: dict = {}

        def robots_for(txt):
            if txt is None:
                return None  # no robots.txt => allow
            rp = parsers.get(txt)
            if rp is None:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(txt.splitlines())
                parsers[txt] = rp
            return rp

        out = []
        for u, txt in zip(url, robots_txt):
            allows = None
            if respect_robots:
                rp = robots_for(txt)
                allows = (lambda x, rp=rp: rp.can_fetch(user_agent, x)) if rp else (lambda x: True)
            out.append(U.should_crawl(u, base_domain, robots_allows=allows, **cfg))
        return pd.Series(out, dtype=bool)

    return policy_ok


# --------------------------------------------------------------------------
# seen-set dedup with bloom prefilter
# --------------------------------------------------------------------------

def anti_join_seen(candidates: DataFrame, seen: DataFrame,
                   bloom=None) -> DataFrame:
    """Exact dedup: left-anti join candidate.clean_url vs seen.url.

    ``bloom`` (optional, pyspark BloomFilter built over seen urls): rows
    the bloom reports unseen bypass the join (bloom has no false
    negatives); only "maybe seen" rows take the shuffle."""
    if bloom is not None:
        maybe = candidates.filter(_bloom_might_contain(bloom, F.col("clean_url")))
        fresh = candidates.filter(~_bloom_might_contain(bloom, F.col("clean_url")))
        verified = maybe.join(
            seen.select(F.col("url").alias("clean_url")), "clean_url", "left_anti"
        )
        return fresh.unionByName(verified)
    return candidates.join(
        seen.select(F.col("url").alias("clean_url")), "clean_url", "left_anti"
    )


def _bloom_might_contain(bloom, col):
    from pyspark.sql.column import Column

    return Column(bloom.mightContain(col._jc))


def build_seen_bloom(seen: DataFrame, expected: int, fpp: float):
    """Broadcastable Bloom filter over the seen-set (df.stat.bloomFilter)."""
    try:
        return seen.stat.bloomFilter("url", expected, fpp)
    except Exception:
        return None


# --------------------------------------------------------------------------
# wave scheduling: dedup -> trap -> policy -> new frontier
# --------------------------------------------------------------------------

def schedule_wave(
    candidates: DataFrame,
    seen: DataFrame,
    pattern_counts: DataFrame,   # signature, cnt
    hosts: DataFrame,            # host, robots_txt (broadcast side)
    base_domain: str,
    config: CrawlConfig,
    seq_start: int,
    bloom=None,
):
    """One wave of frontier growth. Returns (new_frontier, counts_delta,
    trap_hits).

    Exact-semantics derivation (link_manager.py:83-118, concurrency-1):
    within a wave, candidates are processed in (src_seq, link_idx) order.
    For a signature s with prior accepted count P and threshold T, every
    policy-accepted, first-occurrence candidate increments the count, and
    a candidate is trapped iff the count at its turn >= T. Since only
    accepted candidates increment, the count at position p equals
    P + min(apb(p), max(0, T-P)) where apb(p) = number of accepted
    first-occurrences of s strictly before p. Hence:

        trapped(p)  <=>  P + least(apb(p), greatest(T-P, 0)) >= T
        accepted(p) <=>  first_occurrence(p) and policy(p) and not trapped(p)

    — a closed form needing only one running count, no recursion.
    A duplicate occurrence whose first occurrence was accepted is
    "already seen" (not a trap hit); one whose first occurrence was
    rejected re-evaluates the trap gate at its own position — also
    captured by the formula.
    """
    w_pos = [F.col("src_seq").asc(), F.col("link_idx").asc()]

    occ = candidates.filter(F.col("clean_url") != F.col("src_url"))
    occ = anti_join_seen(occ, seen, bloom)

    occ = occ.join(F.broadcast(hosts.select("host", "robots_txt")), "host", "left")
    policy_udf = make_policy_udf(base_domain, config)
    occ = occ.withColumn("policy_ok", policy_udf(F.col("clean_url"), F.col("robots_txt")))

    w_url = Window.partitionBy("clean_url").orderBy(*w_pos)
    occ = occ.withColumn("occ_rank", F.row_number().over(w_url))
    occ = occ.join(
        pattern_counts.withColumnRenamed("cnt", "prior"), "signature", "left"
    ).fillna({"prior": 0})

    w_sig_before = (
        Window.partitionBy("signature").orderBy(*w_pos)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    first_and_ok = ((F.col("occ_rank") == 1) & F.col("policy_ok")).cast("int")
    occ = occ.withColumn(
        "apb", F.coalesce(F.sum(first_and_ok).over(w_sig_before), F.lit(0))
    )
    T = F.lit(config.trap_threshold)
    trapped = (
        F.col("prior") + F.least(F.col("apb"), F.greatest(T - F.col("prior"), F.lit(0))) >= T
    )
    occ = occ.withColumn("trapped", trapped)
    occ = occ.withColumn(
        "accepted", (F.col("occ_rank") == 1) & F.col("policy_ok") & ~F.col("trapped")
    )

    # intra-wave "already seen": an earlier occurrence of this URL was accepted
    w_url_before = w_url.rowsBetween(Window.unboundedPreceding, -1)
    occ = occ.withColumn(
        "seen_intra",
        F.coalesce(F.sum(F.col("accepted").cast("int")).over(w_url_before), F.lit(0)) > 0,
    ).persist()

    accepted = occ.filter("accepted").select(
        F.col("clean_url").alias("url"), "depth", "src_seq", "link_idx"
    )
    new_frontier = add_global_seq(accepted, ["src_seq", "link_idx"], seq_start).drop(
        "src_seq", "link_idx"
    )

    counts_delta = occ.filter("accepted").groupBy("signature").agg(
        F.count("*").alias("cnt_delta")
    )
    trap_hits = (
        occ.filter(F.col("trapped") & ~F.col("seen_intra"))
        .groupBy("signature")
        .agg(
            F.count("*").alias("hits"),
            F.min_by(F.col("clean_url"), F.struct("src_seq", "link_idx")).alias("example_url"),
        )
    )
    return new_frontier, counts_delta, trap_hits, occ


# --------------------------------------------------------------------------
# politeness + skew handling
# --------------------------------------------------------------------------

def host_of(url_col):
    return F.regexp_extract(url_col, r"^https?://([^/]+)", 1)


def apply_politeness(eligible: DataFrame, hosts: DataFrame,
                     wave_seconds: float) -> tuple[DataFrame, DataFrame]:
    """Per-host per-wave fetch quota: a host with crawl-delay d gets
    floor(wave_seconds/d) fetch slots this wave (>=1); overflow rows are
    deferred to the next wave preserving their seq (FIFO within host).
    This is the batch re-expression of the reference's token-bucket
    pacing (rate_limiter.py:24-38) made per-host, as the north rule
    requires. Returns (selected, deferred)."""
    e = eligible.withColumn("host", host_of(F.col("url")))
    e = e.join(F.broadcast(hosts.select("host", "crawl_delay")), "host", "left").fillna(
        {"crawl_delay": 0.0}
    )
    budget = F.when(
        F.col("crawl_delay") > 0,
        F.greatest(F.floor(F.lit(wave_seconds) / F.col("crawl_delay")), F.lit(1)),
    ).otherwise(F.lit(2**62))
    w_host = Window.partitionBy("host").orderBy("seq")
    e = e.withColumn("_hrank", F.row_number().over(w_host)).withColumn("_budget", budget)
    selected = e.filter(F.col("_hrank") <= F.col("_budget")).drop(
        "_hrank", "_budget", "crawl_delay", "host"
    )
    deferred = e.filter(F.col("_hrank") > F.col("_budget")).drop(
        "_hrank", "_budget", "crawl_delay", "host"
    )
    return selected, deferred


def salted_repartition(df: DataFrame, url_col: str = "url",
                       num_partitions: int | None = None,
                       salt_buckets: int = 16) -> DataFrame:
    """Spread hot hosts across ``salt_buckets`` partitions while keeping
    host affinity for cold hosts: partition key = xxhash64(host, salt)
    with salt = xxhash64(url) % salt_buckets. Breaks hot-domain skew in
    the fetch/extract stage (north_rule; SURVEY.md §4)."""
    host = host_of(F.col(url_col))
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    key = F.xxhash64(host, salt)
    if num_partitions:
        return df.repartition(num_partitions, key)
    return df.repartition(key)
