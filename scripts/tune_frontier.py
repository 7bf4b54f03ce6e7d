#!/usr/bin/env python
"""Interleaved A/B tuner for the frontier wave job.

Noise on this host is +/-3x, so variants are interleaved within one JVM
across cycles and each variant keeps its min — comparisons stay fair
even when a noise window eats a whole cycle. Usage:

    python scripts/tune_frontier.py <cpus> [n] [cycles]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cpus: int, n: int, cycles: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    import bench
    from librecrawl_spark.config import CrawlConfig
    from librecrawl_spark.operators import frontier as FR
    from librecrawl_spark.session import WAVE_BROADCAST_THRESHOLD, get_spark

    spark = get_spark(f"tune-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.sql.autoBroadcastJoinThreshold":
                                  str(WAVE_BROADCAST_THRESHOLD)})
    m = bench.SEEN_M
    cands, seen, hosts = bench.build_frontier_inputs(spark, n, m, bench.N_HOSTS)
    cands, seen, hosts = cands.persist(), seen.persist(), hosts.persist()
    cands.count(), seen.count(), hosts.count()
    cfg = CrawlConfig(trap_threshold=1_000_000_000, crawl_external=True,
                      respect_robots=True, wave_seconds=3600.0)
    counts = spark.createDataFrame([], schema="signature string, cnt long")
    host_rules = FR.compile_robots_rules(hosts, cfg.user_agent).persist()
    host_rules.count()

    def run_wave(seen_big: bool) -> float:
        t0 = time.time()
        nf, cd, th, occ = FR.schedule_wave(
            cands, seen, counts, hosts, "h0.example", cfg, seq_start=0,
            src_seq_bounds=(0, n - 1), seen_big=seen_big, host_rules=host_rules)
        nf = nf.persist()
        sel, _ = FR.apply_politeness(nf, hosts, cfg.wave_seconds)
        sel.count()
        dt = time.time() - t0
        nf.unpersist()
        occ.unpersist()
        return dt

    def set_conf(aqe: bool, bcast_mb: int) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(bcast_mb * 1024 * 1024))

    variants = {
        # (aqe, autoBroadcast MB, seen_big hint)
        "aqe_shufflehash": (True, 10, True),
        "aqe_planner": (True, 10, False),
        "noaqe_shufflehash": (False, 10, True),
        "noaqe_bigbcast": (False, 64, True),
        "aqe_bigbcast": (True, 64, True),
    }
    best: dict = {}
    for cyc in range(cycles):
        for name, (aqe, bc, bl) in variants.items():
            set_conf(aqe, bc)
            dt = run_wave(bl)
            best[name] = min(best.get(name, 1e18), dt)
            print(f"cycle {cyc} {name}: {dt:.2f}s", file=sys.stderr, flush=True)
    set_conf(True, 10)
    print("TUNE_RESULT " + json.dumps({"cpus": cpus, "n": n,
                                       "best": {k: round(v, 2) for k, v in best.items()}}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]),
         int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000,
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
