"""priority_wave_cut: exact (priority DESC, seq ASC) wave selection via
range-bucket counting — equality with the window-based reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window, functions as F

from librecrawl_spark.operators.frontier import priority_wave_cut


@pytest.fixture(scope="module")
def pending(spark):
    rng = random.Random(7)
    rows = [(f"https://p.example/{i}", i, rng.randint(0, 9))
            for i in range(2000)]
    return spark.createDataFrame(
        rows, "url string, seq long, priority int").persist()


def _reference(pending, budget):
    w = Window.orderBy(F.desc("priority"), F.asc("seq"))
    ranked = pending.withColumn("_rn", F.row_number().over(w))
    sel = {r["url"] for r in ranked.filter(F.col("_rn") <= budget).collect()}
    return sel


@pytest.mark.parametrize("budget", [1, 137, 500, 1999])
def test_matches_window_reference(spark, pending, budget):
    sel, dfr = priority_wave_cut(pending, budget)
    got = {r["url"] for r in sel.collect()}
    assert got == _reference(pending, budget)
    assert dfr.count() == 2000 - budget
    # selected + deferred partition the input
    assert sel.unionByName(dfr).count() == 2000
    assert set(sel.columns) == {"url", "seq", "priority"}


def test_budget_covers_all_and_zero(spark, pending):
    sel, dfr = priority_wave_cut(pending, 5000)
    assert sel.count() == 2000 and dfr.count() == 0
    sel0, dfr0 = priority_wave_cut(pending, 0)
    assert sel0.count() == 0 and dfr0.count() == 2000


def test_constant_priority_degenerates_to_fifo(spark):
    rows = [(f"https://p.example/{i}", i, 3) for i in range(100)]
    df = spark.createDataFrame(rows, "url string, seq long, priority int")
    sel, _ = priority_wave_cut(df, 10)
    assert sorted(r["seq"] for r in sel.collect()) == list(range(10))


def test_fifo_within_priority_class(spark):
    rows = ([(f"https://hi.example/{i}", 100 + i, 9) for i in range(5)]
            + [(f"https://lo.example/{i}", i, 1) for i in range(5)])
    df = spark.createDataFrame(rows, "url string, seq long, priority int")
    sel, _ = priority_wave_cut(df, 7)
    got = sel.collect()
    assert sum(r["priority"] == 9 for r in got) == 5
    lo = sorted(r["seq"] for r in got if r["priority"] == 1)
    assert lo == [0, 1]  # FIFO within the low class
