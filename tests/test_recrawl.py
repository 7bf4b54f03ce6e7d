"""recrawl_priority / crawl_budget_allocation vs hand-computed and
brute-force Python replicas (same estimator formulas, float64)."""

import math

import pytest
from pyspark.sql import Row

from librecrawl_spark.operators.recrawl import (
    crawl_budget_allocation,
    recrawl_priority,
)

AS_OF = "2024-03-01 00:00:00"


def _obs(spark, rows):
    from datetime import datetime

    parse = lambda t: datetime.strptime(t, "%Y-%m-%d %H:%M:%S")  # noqa: E731
    return spark.createDataFrame(
        [Row(url=u, ts=parse(t), changed=c) for u, t, c in rows],
        "url string, ts timestamp, changed boolean",
    )


class TestRecrawlPriority:
    def test_matches_hand_formula(self, spark):
        rows = [
            ("a", "2024-01-01 00:00:00", False),
            ("a", "2024-01-02 00:00:00", True),
            ("a", "2024-01-03 00:00:00", True),
            ("a", "2024-01-05 00:00:00", False),
        ]
        out = recrawl_priority(_obs(spark, rows), AS_OF).collect()
        assert len(out) == 1
        r = out[0]
        n, x = 4, 2
        ibar_h = (4 * 24.0) / 3  # span 4 days over 3 intervals
        lam = -math.log((n - x + 0.5) / (n + 0.5)) / ibar_h
        age_h = 56 * 24.0  # Jan 5 -> Mar 1 2024 (leap year: 26 + 29 + 1)
        assert r.n_obs == 4 and r.n_changed == 2
        assert r.lambda_per_hour == pytest.approx(round(lam, 6), abs=1e-6)
        assert r.age_hours == pytest.approx(round(age_h, 6), abs=1e-6)
        assert r.priority == pytest.approx(round(lam * age_h, 6), abs=1e-6)

    def test_all_changed_stays_finite_and_none_changed_zero(self, spark):
        rows = [
            ("hot", "2024-01-01 00:00:00", True),
            ("hot", "2024-01-01 06:00:00", True),
            ("cold", "2024-01-01 00:00:00", False),
            ("cold", "2024-01-01 06:00:00", False),
        ]
        by = {r.key: r for r in
              recrawl_priority(_obs(spark, rows), AS_OF).collect()}
        assert math.isfinite(by["hot"].lambda_per_hour)
        assert by["hot"].lambda_per_hour > 0
        assert by["cold"].lambda_per_hour == 0.0
        assert by["cold"].priority == 0.0

    def test_single_observation_dropped(self, spark):
        rows = [("solo", "2024-01-01 00:00:00", True),
                ("pair", "2024-01-01 00:00:00", False),
                ("pair", "2024-01-02 00:00:00", True)]
        keys = {r.key for r in
                recrawl_priority(_obs(spark, rows), AS_OF).collect()}
        assert keys == {"pair"}


def _alloc_py(scores, budget, cap):
    """Brute-force largest-remainder replica."""
    tot = float(sum(s for _, s in scores))
    d = []
    for h, s in scores:
        raw = budget * s / tot
        base = min(cap, math.floor(raw))
        d.append({"host": h, "score": s, "base": base,
                  "frac": raw - math.floor(raw), "head": cap - base})
    leftover = budget - sum(r["base"] for r in d)
    order = sorted(d, key=lambda r: (-(r["frac"] if r["head"] > 0 else -1.0),
                                     r["host"]))
    for i, r in enumerate(order):
        r["extra"] = 1 if (r["head"] > 0 and i < leftover) else 0
    return {r["host"]: r["base"] + r["extra"] for r in d}


class TestBudgetAllocation:
    def _run(self, spark, scores, budget, cap):
        df = spark.createDataFrame(scores, "host string, score long")
        got = {r.host: r.allocated
               for r in crawl_budget_allocation(df, budget, cap).collect()}
        assert got == _alloc_py(scores, budget, cap)
        return got

    def test_proportional_with_cap(self, spark):
        scores = [("a", 50), ("b", 30), ("c", 15), ("d", 5)]
        got = self._run(spark, scores, 100, 40)
        assert got["a"] == 40  # capped below its 50 proportional share
        assert sum(got.values()) <= 100

    def test_exact_fill_no_cap_binding(self, spark):
        scores = [("a", 1), ("b", 1), ("c", 1)]
        got = self._run(spark, scores, 10, 10)
        assert sum(got.values()) == 10
        assert sorted(got.values()) == [3, 3, 4]
        assert got["a"] == 4  # equal fracs -> tie broken by host asc

    def test_caps_underfill(self, spark):
        scores = [("a", 9), ("b", 1)]
        got = self._run(spark, scores, 100, 20)
        # a's cap binds (raw 90 -> 20); b gets its floor 10 plus the one
        # largest-remainder page; the rest of the budget stays unspent
        assert got == {"a": 20, "b": 11}
        assert sum(got.values()) < 100
