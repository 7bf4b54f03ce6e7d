"""asof_join / range_join_by_bucket vs brute-force references."""

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from librecrawl_spark.operators.temporal import asof_join, range_join_by_bucket

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    rnd = random.Random(7)
    left = [(i, rnd.randrange(4), _ts(rnd.uniform(0, 3600))) for i in range(120)]
    right = [(1000 + i, rnd.randrange(4), _ts(rnd.uniform(0, 3600)),
              round(rnd.uniform(0, 9), 2)) for i in range(200)]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k long, ts timestamp, v double")
    return left, right, ldf, rdf


def brute_asof(left, right, tol_us=None):
    out = {}
    for lid, k, lts in left:
        cands = [(rts, rid, v) for rid, rk, rts, v in right
                 if rk == k and rts <= lts]
        if not cands:
            out[lid] = (None, None, None)
            continue
        rts, rid, v = max(cands)
        gap = int((lts - rts) / dt.timedelta(microseconds=1))
        if tol_us is not None and gap > tol_us:
            out[lid] = (None, None, None)
        else:
            out[lid] = (rid, v, gap)
    return out


def test_asof_matches_bruteforce(frames):
    left, right, ldf, rdf = frames
    got = {r["lid"]: (r["rid"], r["v"], r["asof_gap_us"])
           for r in asof_join(ldf, rdf, on="k", ts_col="ts",
                              payload_cols=["rid", "v"]).collect()}
    assert got == brute_asof(left, right)
    # every left row survives (left-join semantics)
    assert len(got) == len(left)


def test_asof_tolerance(frames):
    left, right, ldf, rdf = frames
    tol = 120_000_000  # 2 minutes
    got = {r["lid"]: (r["rid"], r["v"], r["asof_gap_us"])
           for r in asof_join(ldf, rdf, on="k", ts_col="ts",
                              payload_cols=["rid", "v"],
                              tolerance_us=tol).collect()}
    want = brute_asof(left, right, tol_us=tol)
    assert got == want
    # the tolerance actually voided something in this fixture
    assert any(v == (None, None, None) for v in want.values())


def test_asof_tie_is_inclusive(spark):
    ldf = spark.createDataFrame([(1, 0, _ts(10))], "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame([(9, 0, _ts(10), 1.5)],
                                "rid long, k long, ts timestamp, v double")
    row = asof_join(ldf, rdf, on="k", ts_col="ts",
                    payload_cols=["rid", "v"]).collect()[0]
    assert (row["rid"], row["asof_gap_us"]) == (9, 0)


def brute_range(points, intervals):
    return sorted(
        (pid, iid) for pid, pk, pts in points
        for iid, ik, s, e in intervals
        if pk == ik and s <= pts < e)


@pytest.mark.parametrize("bucket_us", [1_000_000, 37_000_000, 600_000_000])
def test_range_join_matches_bruteforce(spark, bucket_us):
    rnd = random.Random(11)
    points = [(i, rnd.randrange(3), _ts(rnd.uniform(0, 1800))) for i in range(150)]
    intervals = []
    for i in range(40):
        s = rnd.uniform(0, 1700)
        intervals.append((500 + i, rnd.randrange(3), _ts(s),
                          _ts(s + rnd.uniform(1, 300))))
    pdf = spark.createDataFrame(points, "pid long, k long, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "iid long, k long, start_ts timestamp, end_ts timestamp")
    got = sorted((r["pid"], r["iid"]) for r in range_join_by_bucket(
        pdf, idf, on="k", point_ts="ts", start_col="start_ts",
        end_col="end_ts", bucket_us=bucket_us).collect())
    assert got == brute_range(points, intervals)
    # exactly-once: no duplicate pairs even when intervals span many buckets
    assert len(got) == len(set(got))


def test_range_join_half_open_boundaries(spark):
    pdf = spark.createDataFrame(
        [(1, 0, _ts(10)), (2, 0, _ts(20)), (3, 0, _ts(15))],
        "pid long, k long, ts timestamp")
    idf = spark.createDataFrame([(7, 0, _ts(10), _ts(20))],
                                "iid long, k long, start_ts timestamp, end_ts timestamp")
    got = sorted(r["pid"] for r in range_join_by_bucket(
        pdf, idf, on="k", point_ts="ts", start_col="start_ts",
        end_col="end_ts", bucket_us=5_000_000).collect())
    assert got == [1, 3]  # start inclusive, end exclusive
