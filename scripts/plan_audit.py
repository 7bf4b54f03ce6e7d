#!/usr/bin/env python
"""Physical-plan audit of the headline queries -> BENCH/PLANS.md.

For each audited query (driver-contract entries plus the two pipeline
stages) this captures ``df.explain("formatted")`` at sf0.01 and greps
the plan for the scale-health markers we design for:

- ``PushedFilters`` / ``ReadSchema`` — predicate pushdown + column
  pruning reached the parquet scan (a scan reading all columns for a
  2-column projection is wrong);
- ``WholeStageCodegen`` span count — expressions stayed JVM-side;
- ``BroadcastHashJoin`` vs ``SortMergeJoin`` — small dims broadcast,
  big joins shuffle on keys only where they must;
- ``Exchange`` count — every shuffle is paid for;
- ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas`` —
  vectorized Python only (a bare ``BatchEvalPython`` = row-at-a-time
  UDF would be a red flag, and is asserted absent).

Usage::

    python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the queries whose plans a reviewer should read: one per plan family
AUDITED = [
    "q1_pricing_summary",     # scan -> partial agg -> final agg
    "q3_shipping_priority",   # 3-way join + agg + top-k
    "j1_status_lookup_join",  # link->status lookup join
    "j8_anti_join",           # frontier seen-set anti-join
    "dedup_minhash",          # shingle -> minhash -> band join
    "dedup_jaccard_pairs",    # prefix-filtered inverted-index join
    "sim_cosine_topk",        # brute-force cosine top-k
    "text_langid",            # pure-codegen scalar pipeline
    "events_sessionize",      # session windows (lag + cumsum)
    "w3_topk_per_group",      # per-group top-k window
    "text_repetition",        # per-row HOF run-length scan (zero shuffle)
    "pipe_contamination",     # broadcast inverted-index join
    "q7_volume_shipping",     # 6-table join: dims broadcast, fact SMJ only
    "q19_disjunctive",        # OR-of-ANDs residual over one equi-join
    "graph_pagerank",         # iterative edge join + partial agg rounds
    "pipe_kmeans",            # broadcast-centroid argmax + posexplode agg
    "pipe_tfidf",             # explode + two hash aggs + per-doc window
    "t_asof_join",            # union-tag + one exchange + running last
    "t_range_join",           # bucketized interval equi-join, no NLJ
    "q2_min_cost_supp",       # decorrelated min + join-back
    "q9_product_profit",      # star join, integer-exact money agg
    "t_recrawl_priority",     # single hash agg + row-local ln math
    "p2_budget_alloc",        # host-level window after 1-row broadcast
    "dedup_chunks",           # per-(doc,chunk-hash) counts, no hash window
    "kw_page_keywords",       # explode -> two hash aggs -> per-doc top-k
    "kw_cannibalization",     # keyword self-join over per-page top terms
    "p3_priority_wave",       # bucket-counted priority cut, no global sort
    "sk_kmv_distinct",        # hash distinct -> TakeOrdered bottom-k
    "graph_bfs_dist",         # per-hop frontier join + anti-join
    "text_unigram_lm",        # explode -> vocab join -> per-doc mean
    "dedup_containment",      # asymmetric prefix-filtered index join
    "graph_hits",             # 2 L1-normalized hub/authority rounds
    "sk_kmv_by_group",        # per-group bottom-k sketch window
    "pipe_priority_sample",   # weighted hash-priority TakeOrdered
    "dedup_minhash_inc",      # incremental new-vs-index band join
]

# BLIND SPOT (documented): graph_hits / graph_bfs_dist / graph_pagerank
# truncate lineage per round via localCheckpoint(eager=False), so their
# final explain() shows an ExistingRDD scan — the per-round joins
# (including hits' two deliberate 1-row broadcast normalizer joins,
# which would otherwise need ALLOWED entries) are NOT visible to this
# audit. test_graph_plan_unrolled audits one un-checkpointed round of
# each so the per-round shape is still asserted somewhere explain() can
# see it.

RED_FLAGS = ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin")

# sim_cosine_topk broadcasts a literal 1-row query vector against the
# embeddings scan — a BroadcastNestedLoopJoin with a 1-row build side is
# the plan you WANT there (VERDICT r3 adjudicated it correct); same
# pattern for pipe_kmeans (k-row centroid table joined to every vector:
# the assignment step IS a deliberate k-way fanout with a broadcast
# build) and pipe_tfidf (1-row corpus-size aggregate). Every other query
# must be free of all three flags.
ALLOWED = {
    "sim_cosine_topk": {"BroadcastNestedLoopJoin"},
    "pipe_kmeans": {"BroadcastNestedLoopJoin"},
    "pipe_tfidf": {"BroadcastNestedLoopJoin"},
    # p2: the host-score frame joins a broadcast 1-row score total —
    # same deliberate 1-row build side as pipe_tfidf
    "p2_budget_alloc": {"BroadcastNestedLoopJoin"},
    # unigram LM joins a broadcast 1-row corpus-token total — the
    # identical deliberate shape as pipe_tfidf's 1-row N aggregate
    "text_unigram_lm": {"BroadcastNestedLoopJoin"},
}


def marker_summary(plan: str) -> dict:
    # formatted explain prints each operator once as a numbered detail
    # entry "(N) OpName" — count those to avoid double-counting the tree
    # rendering; codegen spans appear as "[codegen id : N]" annotations
    return {
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "arrow_py": len(re.findall(r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "red": [f for f in RED_FLAGS if f in plan],
        "read_schemas": re.findall(r"ReadSchema: (struct<[^\n]{0,120})", plan),
    }


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(sf_dir: str) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    import __spark_entry__ as entry_mod
    from librecrawl_spark.session import get_spark

    # AQE is ON in the production session (session.py); it is disabled
    # here ONLY because AdaptiveSparkPlan's pre-execution formatted plan
    # omits the [codegen id : N] annotations this audit counts — the
    # static plan shows the same operators plus codegen spans.
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    qs = entry_mod.queries()
    rows, sections = [], []
    for name in AUDITED:
        plan = fmt_plan(qs[name](spark, sf_dir))
        m = marker_summary(plan)
        rows.append((name, m))
        sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")

    out = [
        "# BENCH/PLANS.md — physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        f"Input: `{sf_dir}` parquet tables, `local[4]`, AQE off for explain legibility (production session enables it). Markers per",
        "query (counts from `explain(\"formatted\")`); **red flags**",
        f"({', '.join(RED_FLAGS)}) are asserted ABSENT — any hit fails the run",
        "(allowed exceptions: the deliberate tiny-broadcast-build joins in",
        "sim_cosine_topk / pipe_kmeans / pipe_tfidf — 1-row query vector,",
        "k-row centroid table, 1-row corpus-size aggregate).",
        "",
        "| query | codegen spans | exchanges | broadcast joins | sort-merge joins | pushed-filter scans | arrow-python ops | red flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    failed = []
    for name, m in rows:
        bad = [f for f in m["red"] if f not in ALLOWED.get(name, ())]
        if bad:
            failed.append((name, bad))
        shown = [f + (" (allowed: tiny broadcast build side)"
                      if f in ALLOWED.get(name, ()) else "") for f in m["red"]]
        out.append(
            f"| {name} | {m['codegen_spans']} | {m['exchanges']} | {m['bhj']} "
            f"| {m['smj']} | {m['pushed']} | {m['arrow_py']} | "
            f"{', '.join(shown) or '—'} |")
    out += [
        "",
        "Column pruning evidence — the widest `ReadSchema` each query asks",
        "of its parquet scans (pruned to the referenced columns, never the",
        "full table schema):",
        "",
    ]
    for name, m in rows:
        widest = max(m["read_schemas"], key=len, default="(no parquet scan — generated input)")
        out.append(f"- `{name}`: `{widest}`")
    out += ["", "---", ""] + sections
    with open(f"{REPO}/BENCH/PLANS.md", "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote BENCH/PLANS.md ({len(rows)} plans)")
    if failed:
        print(f"RED FLAGS: {failed}")
        raise SystemExit(1)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
