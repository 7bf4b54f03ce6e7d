"""Bucketed-table support: shuffle-free co-located joins for the
frontier's biggest recurring join.

At 10^10 URLs the seen-set anti-join is the one join both sides of
which are huge: candidates (~10^8/wave) vs seen (~10^10). Broadcast is
impossible and every wave pays a full shuffle of the seen side unless
its storage layout already matches the join distribution. Bucketing is
Spark's answer: persist the table hash-partitioned (and sorted) by the
join key; a sort-merge join between two tables bucketed on the same key
with the same bucket count then needs NO Exchange on either side —
each task zips bucket i with bucket i (see
``tests/test_bucketing.py``, which asserts the Exchange-free plan).

The crawl engine's hot loop keeps the seen-set as an in-session
DataFrame (bloom + broadcast/shuffle-hash anti-join, operators/
frontier.py) because local-mode waves are short; bucketing pays off
when the seen-set LIVES in storage between runs — the incremental /
resume path. ``TableIO`` stays the snapshot layer; this module is the
layout layer for tables whose next reader joins on a known key.

Bucket count sizing at 100 TB: buckets are the unit of join-task
parallelism and must hold a sorted run in executor memory —
``n_buckets >= table_bytes / 256MB``, rounded to a power of two so a
cluster resize keeps bucket pruning effective. 8 buckets in the tests
is the same math at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "is_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    Bucket metadata lives in the session catalog — ``saveAsTable`` is
    required (plain ``parquet(path)`` writes cannot record bucketing).
    With ``path`` the table is external: data files stay at ``path``,
    only metadata registers in the catalog.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves the bucketing distribution, so a join
    on the bucket key against an equally-bucketed table plans without
    an Exchange on either side."""
    return spark.table(table)


def is_bucketed(spark: SparkSession, table: str, key: str) -> bool:
    """True when the catalog records ``table`` as bucketed by ``key``
    (DESCRIBE EXTENDED carries Bucket Columns for v1 parquet tables)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: (r["data_type"] or "") for r in rows}
    return key in info.get("Bucket Columns", "")
