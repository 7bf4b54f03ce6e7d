#!/usr/bin/env python
"""Stage-by-stage scaling profile of the frontier-scheduling pipeline.

Runs cumulative cuts of schedule_wave at a given local[N] and prints one
JSON line per cut (min over reps), so two subprocess runs (8 vs 32)
expose WHICH stage loses scaling efficiency. Usage:

    python scripts/profile_frontier.py <cpus> [n_candidates]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(cpus: int, n: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    import bench
    from librecrawl_spark.config import CrawlConfig
    from librecrawl_spark.operators import frontier as FR
    from librecrawl_spark.session import WAVE_BROADCAST_THRESHOLD, get_spark

    spark = get_spark(f"prof-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.sql.autoBroadcastJoinThreshold":
                                  str(WAVE_BROADCAST_THRESHOLD)})
    # match the suite input at suite N, the scaling input at scaling N
    m = bench.SCALING_SEEN_M if n >= bench.SCALING_N else bench.SEEN_M
    cands, seen, hosts = bench.build_frontier_inputs(spark, n, m, bench.N_HOSTS)
    cands, seen, hosts = cands.persist(), seen.persist(), hosts.persist()
    cands.count(), seen.count(), hosts.count()

    cfg = CrawlConfig(trap_threshold=1_000_000_000, crawl_external=True,
                      respect_robots=True, wave_seconds=3600.0)
    reps = int(os.environ.get("BENCH_REPS", "2"))

    rules = FR.compile_robots_rules(hosts, cfg.user_agent).persist()
    rules.count()
    seen_big = m >= 1_500_000

    def build(cut: str):
        # mirrors schedule_wave's current physical plan: packed-long
        # dedup key FIRST, then the seen anti-join over deduped rows
        # (one probe per URL, reusing the agg's hash partitioning),
        # native fast-path policy
        occ = cands.filter(F.col("clean_url") != F.col("src_url")).drop("src_url")
        if cut == "selffilter":
            return occ
        packed = (F.shiftleft(F.col("src_seq").cast("long"), 28)
                  + F.shiftleft(F.col("link_idx").cast("long"), 8)
                  + F.col("depth").cast("long"))
        first = (
            occ.withColumn("_p", packed)
            .groupBy("clean_url")
            .agg(F.min("_p").alias("_p"),
                 F.first("signature").alias("signature"),
                 F.first("host").alias("host"))
        )
        if cut == "dedup_first":
            return first
        first = FR.anti_join_seen(first, seen, big=seen_big)
        if cut == "antijoin":
            return first
        first = first.join(
            F.broadcast(rules.select("host", "rule1_prefix", "rule1_allow",
                                     "allow_all", "disallow_all", "simple", "n_rules")),
            "host", "left")
        if cut == "hosts_join":
            return first
        elig, m, fast_ok = FR.native_policy_exprs_fast(F.col("clean_url"), "h0.example", cfg)
        first = first.filter(elig).withColumn("policy_ok", fast_ok).select(
            "clean_url", "_p", "signature", "policy_ok")
        if cut == "policy_native":
            return first
        return None

    results = {}
    for cut in ("selffilter", "dedup_first", "antijoin", "hosts_join", "policy_native"):
        best = 1e18
        for _ in range(reps):
            t0 = time.time()
            noop(build(cut))
            best = min(best, time.time() - t0)
        results[cut] = round(best, 2)
        print(f"PROGRESS {cut} {best:.2f}", file=sys.stderr, flush=True)

    # full pipeline pieces beyond the cuts — precompiled host_rules,
    # seen_big regime exactly as bench.bench_frontier_schedule runs it
    best = 1e18
    for _ in range(reps):
        t0 = time.time()
        nf, cd, th, occ_h = FR.schedule_wave(
            cands, seen, spark.createDataFrame([], "signature string, cnt long"),
            hosts, "h0.example", cfg, seq_start=0, src_seq_bounds=(0, n - 1),
            seen_big=seen_big, host_rules=rules)
        noop(nf)
        best = min(best, time.time() - t0)
        occ_h.unpersist()
    results["schedule_wave_noop"] = round(best, 2)

    best = 1e18
    for _ in range(reps):
        t0 = time.time()
        nf, cd, th, occ_h = FR.schedule_wave(
            cands, seen, spark.createDataFrame([], "signature string, cnt long"),
            hosts, "h0.example", cfg, seq_start=0, src_seq_bounds=(0, n - 1),
            seen_big=seen_big, host_rules=rules)
        nf = nf.persist()
        sel, defr = FR.apply_politeness(nf, hosts, cfg.wave_seconds)
        sel.count()
        best = min(best, time.time() - t0)
        nf.unpersist()
        occ_h.unpersist()
    results["full_with_politeness"] = round(best, 2)

    print("PROFILE_RESULT " + json.dumps({"cpus": cpus, "n": n, "stages": results}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000)
