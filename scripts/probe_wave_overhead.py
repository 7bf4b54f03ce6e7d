"""Noise-independent decomposition of the frontier wave's per-job
FIXED cost: count the scheduler work (jobs / stages / task launches)
one steady-state wave generates at each parallelism level.

Why this probe exists: the two-size fit (probe_frontier_scaling.py)
shows the per-job constant GROWS with cores (2.1s at local[8] -> 3.3s
at local[32], round-4 banked pools). Wall-clock probes can't name the
culprit under this host's +/-40% noise windows — but the *counts* are
properties of the plan, not the window: identical across reps and
levels except where partition counts track cores. One wave is 2 driver
actions, which AQE expands into ~20 jobs / ~59 stages; every stage's
task count is proportional to either ``defaultParallelism`` (leaf
scans) or ``spark.sql.shuffle.partitions = 2x cores`` (exchanges), so
total task launches scale ~4x from local[8] to local[32] while the
DAGScheduler event loop that serializes+launches them stays
single-threaded. Task launches x per-launch driver cost IS the
core-proportional component of the fixed cost; the remainder (AQE
re-plan rounds, broadcast builds) is level-invariant.

On a real 4N-executor cluster the same growth exists but the constant
still amortizes: a 10^8-candidate wave runs the same ~60 stages with
partitions sized by AQE to data, not cores, and the per-task work is
seconds, not milliseconds.

Writes BENCH/wave_overhead.json; bench.py --rewrite-md renders it.
Usage: python scripts/probe_wave_overhead.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CANDS = 1_000_000  # fixed-cost regime: small enough that overhead dominates


def child(cpus: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    import bench
    from librecrawl_spark.config import CrawlConfig
    from librecrawl_spark.operators import frontier as FR
    from librecrawl_spark.session import WAVE_BROADCAST_THRESHOLD, get_spark

    spark = get_spark(f"ovh-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.sql.autoBroadcastJoinThreshold":
                                  str(WAVE_BROADCAST_THRESHOLD)})
    sc = spark.sparkContext
    n, m = N_CANDS, bench.SCALING_SEEN_M
    cands, seen, hosts = bench.build_frontier_inputs(spark, n, m, bench.N_HOSTS)
    cands = cands.persist()
    n_shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seen = seen.repartition(n_shuf, "url").persist()
    hosts = hosts.persist()
    cands.count(), seen.count(), hosts.count()
    cfg = CrawlConfig(trap_threshold=1_000_000_000, crawl_external=True,
                      respect_robots=True, wave_seconds=3600.0)
    counts = spark.createDataFrame([], schema="signature string, cnt long")
    rules = FR.compile_robots_rules(hosts, cfg.user_agent).persist()
    rules.count()
    tracker = sc.statusTracker()

    def one_wave():
        t0 = time.time()
        nf, _cd, _th, occ = FR.schedule_wave(
            cands, seen, counts, hosts, "h0.example", cfg, seq_start=0,
            src_seq_bounds=(0, n - 1), seen_big=True, host_rules=rules)
        nf = nf.persist()
        sel, _ = FR.apply_politeness(nf, hosts, cfg.wave_seconds,
                                     seq_bounds=(0, n - 1))
        ns = sel.count()
        w = time.time() - t0
        nf.unpersist(), occ.unpersist()
        return w, ns

    one_wave()  # warm: input caches + code paths
    before = set(tracker.getJobIdsForGroup(None) or [])
    wall, n_out = one_wave()
    after = set(tracker.getJobIdsForGroup(None) or [])
    jobs = sorted(after - before)
    stages = tasks = 0
    for j in jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is None:
                continue
            stages += 1
            tasks += si.numTasks
    print("OVERHEAD " + json.dumps({
        "cpus": cpus, "n_candidates": n, "scheduled_out": n_out,
        "jobs": len(jobs), "stages": stages, "task_launches": tasks,
        "wall_sec": round(wall, 2)}))
    spark.stop()


def main() -> None:
    out = {"n_candidates": N_CANDS, "levels": {}, "ts": time.time()}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus)],
            capture_output=True, text=True, cwd=REPO)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("OVERHEAD")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child {cpus} failed")
        r = json.loads(line[-1].split(" ", 1)[1])
        out["levels"][str(cpus)] = r
        print(f"local[{cpus}]: {r['jobs']} jobs, {r['stages']} stages, "
              f"{r['task_launches']} task launches", file=sys.stderr)
    l8, l32 = out["levels"]["8"], out["levels"]["32"]
    assert l8["scheduled_out"] == l32["scheduled_out"], "plan output drift"
    out["task_launch_ratio"] = round(
        l32["task_launches"] / l8["task_launches"], 2)
    with open(f"{REPO}/BENCH/wave_overhead.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
