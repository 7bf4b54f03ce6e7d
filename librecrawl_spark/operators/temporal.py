"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join.

Both are expressed as compositions of existing DataFrame ops (one
shuffle each, no per-row Python, no cartesian blowup), so they survive
the 100 TB scale-up:

- ``asof_join``: union-tag + partitioned sort + last-non-null
  carry-forward. One exchange on the key, one sort — identical shape to
  a sort-merge join, and per-key state is O(1) during the window scan.
  This is the standard log-structured formulation (used for trade/quote
  joins); the reference has no temporal engine, but a recrawl pipeline
  needs it constantly: "which robots.txt snapshot governed this fetch",
  "which session preceded this purchase".
- ``range_join_by_bucket``: point-in-interval join via time-bucket
  equi-keys. Intervals explode into the fixed-width buckets they
  overlap; points live in exactly one bucket, so each qualifying
  (point, interval) pair is produced exactly once — no post-join dedup.
  Choose ``bucket_width`` near the typical interval length so each
  interval lands in ~2 buckets; the equi-join then carries all the
  pruning and the exact range predicate is a residual filter. This is
  how Databricks' range-join hint and Flink's interval join are built;
  vanilla Spark would otherwise plan BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_by_bucket"]


def _us(col) -> F.Column:
    """Exact integer microseconds since epoch; accepts TIMESTAMP and
    TIMESTAMP_NTZ (unix_micros rejects NTZ — the cast is the identity
    under the session's UTC timeZone, matching DuckDB's epoch_us on
    naive timestamps)."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    payload_cols: list[str],
    tolerance_us: int | None = None,
    right_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with the same ``on`` key and right ts <= left ts (DuckDB/kdb ASOF
    semantics, inclusive tie). Left rows with no predecessor keep null
    payloads (left-join semantics); ``asof_gap_us`` is the exact
    integer microsecond gap (left ts - matched right ts).

    ``tolerance_us`` voids matches older than the tolerance (payloads
    and gap go null), mirroring pandas ``merge_asof(tolerance=...)``.

    Right rows must be unique per (key, ts) for deterministic output —
    pre-dedup with a keep-max/keep-min aggregate if they are not.

    Plan: union both sides tagged (right=0, left=1), one hash exchange
    on the key, one in-partition sort by (ts, tag), then
    ``last(payload, ignorenulls=True)`` over an unbounded-preceding
    running window — per-key O(1) state, no driver collect, no UDF.
    """
    rts = right_ts_col or ts_col
    pay = F.struct(
        F.col(rts).alias("_rts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        pay.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
    )
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_p"].dataType).alias("_p"),
        *left.columns,
    )
    w = (Window.partitionBy("_k").orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    gap = _us(F.col("_ts")) - _us(F.col("_m")["_rts"])
    if tolerance_us is not None:
        in_tol = gap <= F.lit(int(tolerance_us))
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m")))
    out_payload = [
        F.col("_m")[c].alias(c) for c in payload_cols
    ]
    gap_out = F.when(
        F.col("_m").isNotNull(),
        _us(F.col("_ts")) - _us(F.col("_m")["_rts"]),
    ).alias("asof_gap_us")
    return matched.select(*left.columns, *out_payload, gap_out)


def range_join_by_bucket(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
) -> DataFrame:
    """Join each point row to every interval row of the same key whose
    half-open window ``[start, end)`` contains the point's timestamp.
    Returns points' columns + intervals' columns (key column once).

    Plan: a point belongs to exactly one fixed-width time bucket; an
    interval explodes into each bucket it overlaps (``sequence`` over
    bucket ids — intervals must satisfy end > start). The join is then
    a plain equi-join on (key, bucket) with the exact range predicate
    as a residual filter, and because point buckets partition time,
    each qualifying pair appears exactly once. At 100 TB this is one
    shuffle on a well-distributed composite key; interval duplication
    is ceil(len/bucket)+1 rows, bounded by choosing bucket_us near the
    interval length.
    """
    bw = F.lit(int(bucket_us))
    p2 = points.withColumn(
        "_bkt", F.floor(_us(point_ts) / bw))
    i2 = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / bw),
                F.floor((_us(end_col) - 1) / bw),
            )
        ),
    ).withColumnRenamed(on, "_ik")
    joined = p2.join(
        i2,
        (p2[on] == i2["_ik"]) & (p2["_bkt"] == i2["_bkt"]),
    ).filter(
        (_us(point_ts) >= _us(start_col))
        & (_us(point_ts) < _us(end_col))
    )
    keep_i = [c for c in intervals.columns if c != on]
    return joined.select(*[p2[c] for c in points.columns],
                         *[i2[c] for c in keep_i])
