"""Decompose the frontier-stage scaling ratio into per-job fixed cost
vs marginal scheduling rate (same methodology the round-3 verdict
accepted for the extract stage, scripts/probe_extract_scaling.py).

Why: the --scaling headline times ONE input size (16M candidates) per
level. At local[32] the best wall is ~16s, of which a multi-second
per-job constant (Spark job scheduling across the wave's ~15 jobs/
stages, the fused probe actions, Python policy-fallback worker
fan-out, broadcast build of the 1000-host robots rules) does not
shrink with more cores — so the single-size ratio under-reads how the
per-URL work scales. Timing the SAME job at TWO candidate counts per
level and fitting t(n) = fixed + n/rate separates the two:

    fixed_l      = (n2*t1 - n1*t2) / (n2 - n1)   # per-job constant, sec
    marginal_eff = (rate_32 / rate_8) / 4        # per-URL scaling

marginal_eff is the number that survives a 100x scale-up: a real wave
over a 10^10-URL frontier schedules ~10^8-10^9 candidates per job, so
the per-job constant amortizes to noise exactly as it does between the
two sizes here. The seen set stays fixed at the --scaling protocol's
2M rows for both sizes (identical plan shape: shuffle-hash anti-join);
its build cost is therefore part of the measured fixed component.

Per-cell best over PROBE_ROUNDS interleaved rounds (same host-noise
defense as bench.py --scaling: noise only subtracts, per-cell bests
estimate capability). Results accumulate in
BENCH/frontier_fixed_cost.json; bench.py renders them into
BENCH/BASELINE.md (run `python bench.py --rewrite-md` after probing).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (4_000_000, 16_000_000)
LEVELS = (8, 32)
# third-size validation cell (VERDICT r4 #4): the claim "a 10^8-candidate
# wave amortizes the per-job constant to noise" was extrapolated from the
# 4M/16M fit — a 64M cell MEASURES it. Not part of the fit; banked in the
# same pool and reported as predicted-vs-measured. Enable with
# PROBE_VALIDATE=1 (off by default: the cell costs ~1-4 min/level/round).
VALIDATE_N = int(os.environ.get("PROBE_VALIDATE_N", "64000000"))


def child(cpus: int, n: int) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    os.environ["BENCH_REPS"] = "2"
    from bench import SCALING_SEEN_M, bench_frontier_schedule
    from librecrawl_spark.session import WAVE_BROADCAST_THRESHOLD, get_spark

    spark = get_spark(f"probe-frontier-{cpus}-{n}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus * 2,
                      extra_conf={"spark.sql.autoBroadcastJoinThreshold":
                                  str(WAVE_BROADCAST_THRESHOLD)})
    r = bench_frontier_schedule(spark, n=n, m=SCALING_SEEN_M)
    print("PROBE_RESULT " + json.dumps({"cpus": cpus, "n": n, **r}))
    spark.stop()


def _sync_scaling_state(best: dict) -> None:
    """The probe's 16M cells run the --scaling job (same function, same
    input, same per-level protocol), so improvements flow INTO
    BENCH/scaling_state.json — one-way. The pull direction was removed
    when job revisions were introduced: scaling_state keeps all-time
    bests across plan revisions (the accumulated-best protocol never
    resets), while the probe pool must hold cells from the CURRENT plan
    only, or the two-size fit mixes plan versions and produces
    non-physical efficiencies."""
    path = f"{REPO}/BENCH/scaling_state.json"
    try:
        with open(path) as fh:
            st = json.load(fh)
    except (OSError, ValueError):
        return
    if st.get("n") != SIZES[1]:
        return
    changed = False
    for cpus in LEVELS:
        fr = st["results"][str(cpus)]["frontier"]
        key = f"{cpus}:{SIZES[1]}"
        if key in best and best[key] < fr["sec"]:
            fr["sec"] = best[key]
            fr["urls_per_sec"] = round(SIZES[1] / best[key])
            changed = True
    if changed:
        with open(path, "w") as fh:
            json.dump(st, fh)
        print("scaling_state.json frontier bests improved by probe cells",
              file=sys.stderr)


def main() -> None:
    from bench import FRONTIER_JOB_REV

    rounds = int(os.environ.get("PROBE_ROUNDS", "3"))
    state_path = f"{REPO}/BENCH/frontier_fixed_cost.json"
    best: dict[str, float] = {}
    archived: dict[str, dict] = {}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            prior = json.load(fh)
        archived = {k: v for k, v in prior.items()
                    if k.startswith("best_sec_rev")}
        if prior.get("job_rev", 1) == FRONTIER_JOB_REV:
            best = prior.get("best_sec", {})
        else:
            # plan revision changed: archive the old pool (history stays
            # in the file + git) and accumulate fresh same-plan cells
            archived[f"best_sec_rev{prior.get('job_rev', 1)}"] = \
                prior.get("best_sec", {})
            print(f"job_rev {prior.get('job_rev', 1)} -> "
                  f"{FRONTIER_JOB_REV}: starting a fresh probe pool",
                  file=sys.stderr)
    _sync_scaling_state(best)
    validate = os.environ.get("PROBE_VALIDATE") == "1"
    sizes_run = SIZES + ((VALIDATE_N,) if validate else ())
    if os.environ.get("PROBE_ONLY_VALIDATE") == "1":
        # converge just the third-size cells (the fit cells keep their
        # banked bests; the final fit below recomputes from the pool)
        sizes_run = (VALIDATE_N,)
    for rd in range(rounds):
        for cpus in LEVELS:
            for n in sizes_run:
                p = subprocess.run(
                    [sys.executable, __file__, "--child", str(cpus), str(n)],
                    capture_output=True, text=True, cwd=REPO)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("PROBE_RESULT")]
                if not line:
                    print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                    raise SystemExit(f"child {cpus}/{n} failed")
                r = json.loads(line[-1].split(" ", 1)[1])
                key = f"{cpus}:{n}"
                prev = best.get(key)
                best[key] = r["sec"] if prev is None else min(prev, r["sec"])
                print(f"round {rd} local[{cpus}] n={n}: {r['sec']}s "
                      f"({r['urls_per_sec']:,}/s) best={best[key]}s",
                      file=sys.stderr)
                # crash-safe: bank the pool after every cell so a killed
                # or timed-out run never loses the cells it already paid
                # for (the fit fields are recomputed at the end; a
                # partial file carries only job_rev + cells)
                with open(state_path, "w") as fh:
                    json.dump({"job_rev": FRONTIER_JOB_REV,
                               "best_sec": best, "sizes": SIZES,
                               "ts": time.time(), "partial": True,
                               **archived}, fh, indent=1)

    _sync_scaling_state(best)
    n1, n2 = SIZES
    out = {"job_rev": FRONTIER_JOB_REV, "best_sec": best, "sizes": SIZES,
           "ts": time.time(), **archived}
    for cpus in LEVELS:
        t1, t2 = best[f"{cpus}:{n1}"], best[f"{cpus}:{n2}"]
        fixed = (n2 * t1 - n1 * t2) / (n2 - n1)
        rate = (t2 - t1) / (n2 - n1)  # sec per candidate URL, marginal
        out[f"fixed_sec_{cpus}"] = round(fixed, 2)
        out[f"marginal_urls_per_sec_{cpus}"] = round(1.0 / rate)
    r8 = out["marginal_urls_per_sec_8"]
    r32 = out["marginal_urls_per_sec_32"]
    out["naive_eff_16m"] = round(
        (best[f"8:{n2}"] / best[f"32:{n2}"]) / 4, 3)
    out["marginal_eff"] = round((r32 / r8) / 4, 3)
    # pool-quality flag: a fresh (post-rev-bump) pool whose cells all
    # came from one noisy window can produce a physically impossible
    # fit. Impossible means super-linear marginal scaling (>4x from
    # 4x cores, small tolerance for cell noise), a negative fitted
    # constant, or a level whose larger input measured FASTER than its
    # smaller one. A per-job constant that merely grows with cores is
    # NOT flagged — per-stage task-scheduling work is proportional to
    # task count (shuffle partitions = 2x cores here), so the 4N level
    # legitimately carries more per-job overhead.
    out["undersampled"] = bool(
        out["marginal_eff"] > 1.05
        or any(out[f"fixed_sec_{c}"] < 0 for c in LEVELS)
        or any(best[f"{c}:{n2}"] <= best[f"{c}:{n1}"] for c in LEVELS)
    )
    # third-size validation: does the 4M/16M fit predict the 64M cell?
    if all(f"{c}:{VALIDATE_N}" in best for c in LEVELS):
        val = {"n": VALIDATE_N}
        for c in LEVELS:
            measured = best[f"{c}:{VALIDATE_N}"]
            predicted = (out[f"fixed_sec_{c}"]
                         + VALIDATE_N / out[f"marginal_urls_per_sec_{c}"])
            val[str(c)] = {"measured_sec": measured,
                           "predicted_sec": round(predicted, 2),
                           "measured_over_predicted":
                               round(measured / predicted, 3)}
        out["validation_cell"] = val
    with open(state_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
