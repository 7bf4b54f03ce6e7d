"""Recrawl scheduling: change-rate estimation and host budget split.

The reference crawls a site once per run; a production frontier at
10^10 URLs must instead decide *which* URLs to refetch and *how much*
of the per-run budget each host gets. Two operators cover that:

- ``recrawl_priority``: per-URL Poisson change-rate estimate from the
  fetch-observation history (the Cho & Garcia-Molina "Estimating
  Frequency of Change" estimator, TOIT 2003), times the age since the
  last fetch — expected missed changes, the canonical freshness-driven
  recrawl priority. Pure groupBy aggregates: one shuffle on the URL
  key with map-side partial aggregation, no window, no driver state.
- ``crawl_budget_allocation``: split an integer page budget across
  hosts proportionally to a score with a per-host cap, largest-
  remainder rounding (deterministic ties by host name). The window
  ranks one row per *host* (not per page) — at 10^6 hosts that frame
  is a few MB, so the single sort is negligible next to the page-level
  scan that produced the scores; at 10^8+ hosts swap the rank for a
  two-phase bucketed top-k with the same key.

Both stay entirely in JVM expressions (ln/floor/window — no Python),
and both have exact DuckDB twins via integer-microsecond epoch math
and round-6 emitted doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["recrawl_priority", "crawl_budget_allocation"]


def recrawl_priority(
    obs: DataFrame,
    as_of: str,
    key_col: str = "url",
    ts_col: str = "ts",
    changed_col: str = "changed",
) -> DataFrame:
    """Freshness-driven recrawl priority per URL from observation rows.

    Each input row is one fetch observation: ``ts`` = fetch time,
    ``changed`` = the page differed from the previous fetch. Per key
    with >= 2 observations (one interval minimum)::

        n       = observations,  x = observations that saw a change
        ibar    = (max ts - min ts) / (n - 1)      mean interval, hours
        lambda  = -ln((n - x + 0.5) / (n + 0.5)) / ibar   changes/hour
        age     = as_of - max ts                   hours since last fetch
        priority = lambda * age                    expected missed changes

    The ``+0.5`` continuity correction is the Cho & Garcia-Molina
    estimator for binary change observations — it stays finite when
    every interval saw a change (x = n) and is consistent for
    irregular revisit intervals. Keys with a single observation carry
    no interval evidence and are dropped (a seed-list bootstrap rule
    covers them upstream).

    ``as_of`` is an explicit timestamp literal — determinism over wall
    clock, and the caller's scheduler owns "now".

    All time math is exact integer microseconds (``unix_micros`` /
    DuckDB ``epoch_us``) divided once into double hours, so both
    engines feed ``ln`` bit-identical operands; emitted doubles round
    to 6 decimals. Plan: one hash aggregate on the key (map-side
    partial min/max/count/sum), then row-local expressions — the same
    shape at 10^10 observation rows.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    g = (
        obs.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.col(changed_col).cast("int")).alias("n_changed"),
            F.min(us(ts_col)).alias("_t0"),
            F.max(us(ts_col)).alias("_t1"),
        )
        .filter(F.col("n_obs") >= 2)
    )
    hours = 3.6e9  # microseconds per hour
    ibar_h = (
        (F.col("_t1") - F.col("_t0")).cast("double")
        / (F.col("n_obs") - 1).cast("double")
        / F.lit(hours)
    )
    # the log argument is <= 1 so the quotient is >= 0 mathematically;
    # abs folds the IEEE -0.0 that -ln(1.0) produces when x = 0, which
    # engines render differently ("-0" vs "0") and would split hashes
    lam = F.abs(
        -F.log(
            (F.col("n_obs") - F.col("n_changed") + F.lit(0.5))
            / (F.col("n_obs") + F.lit(0.5))
        )
        / ibar_h
    )
    age_h = (
        (F.unix_micros(F.lit(as_of).cast("timestamp")) - F.col("_t1"))
        .cast("double") / F.lit(hours)
    )
    return g.select(
        "key",
        "n_obs",
        "n_changed",
        F.round(lam, 6).alias("lambda_per_hour"),
        F.round(age_h, 6).alias("age_hours"),
        F.round(lam * age_h, 6).alias("priority"),
    )


def crawl_budget_allocation(
    host_scores: DataFrame,
    budget: int,
    cap: int | None = None,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Split an integer page ``budget`` across hosts proportionally to
    ``score``, each host capped at ``cap`` pages, by the largest-
    remainder method:

    1. ``raw = budget * score / sum(score)``; base grant =
       ``min(cap, floor(raw))``.
    2. The leftover (budget - sum of grants) goes one page at a time to
       the hosts with the largest fractional remainder that still have
       cap headroom — ties broken by host name ascending, so the split
       is a pure function of the input.

    When caps bind harder than the leftover can absorb, the allocation
    under-fills the budget rather than overflowing any host (the
    ``allocated`` column sums to ``min(budget, sum of caps)`` in that
    case) — a politeness cap is a hard ceiling, not a suggestion.

    Input is one row per host (aggregate page scores upstream). The
    remainder rank is a single window over host rows only — see module
    docstring for the 10^8-host variant.
    """
    tot = host_scores.agg(
        F.sum(F.col(score_col)).cast("double").alias("_tot"))
    raw = F.lit(float(budget)) * F.col(score_col) / F.col("_tot")
    capped = (F.lit(int(cap)) if cap is not None
              else F.lit(int(budget)))
    base = F.least(capped.cast("long"), F.floor(raw))
    d = (
        host_scores.join(F.broadcast(tot))
        .select(
            F.col(host_col).alias("host"),
            F.col(score_col).alias("score"),
            base.alias("_base"),
            (raw - F.floor(raw)).alias("_frac"),
            (capped.cast("long") - base).alias("_headroom"),
        )
    )
    leftover = F.lit(int(budget)) - F.sum("_base").over(
        Window.partitionBy())
    rank = F.row_number().over(
        Window.partitionBy()
        .orderBy(F.when(F.col("_headroom") > 0, F.col("_frac"))
                 .otherwise(F.lit(-1.0)).desc(),
                 F.col("host").asc()))
    return (
        d.withColumn("_extra",
                     ((F.col("_headroom") > 0)
                      & (rank <= leftover)).cast("long"))
        .select(
            "host",
            "score",
            (F.col("_base") + F.col("_extra")).alias("allocated"),
        )
    )
