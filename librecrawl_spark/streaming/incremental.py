"""Incremental result reads (SURVEY.md §2.8).

The reference has no true streaming: its "liveness" is a 2-second poll
returning list slices past a client offset (main.py:944-966) plus a
30s/50-row batch flush (crawler.py:98-99,714-725). The engine's
equivalent observable: every wave commits a snapshot; a reader holds a
snapshot id and reads only newer data.

Also provides a Structured Streaming adapter: the pages table directory
can be consumed with ``spark.readStream`` for downstream event-time
pipelines, with the wave commit time as event time — this goes beyond
the reference (which cannot feed a streaming consumer at all) but is the
idiomatic Spark path for 'incremental results'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from librecrawl_spark.storage.tableio import TableIO


class IncrementalReader:
    """Poll-equivalent reader: ``new_since`` returns rows added between a
    client's last snapshot and the latest one (main.py:944-966 semantics
    without re-sending history)."""

    def __init__(self, tio: TableIO, table: str = "pages"):
        self.tio = tio
        self.table = table

    def latest_snapshot(self) -> int | None:
        snaps = self.tio.snapshots(self.table)
        return snaps[-1] if snaps else None

    def new_since(self, spark, snapshot_id: int | None) -> tuple[DataFrame, int | None]:
        """Rows in (snapshot_id, latest]; returns (df, latest_id)."""
        latest = self.latest_snapshot()
        if latest is None:
            raise FileNotFoundError(f"no snapshots for {self.table}")
        cur = self.tio.read(spark, self.table, latest)
        if snapshot_id is None:
            return cur, latest
        if snapshot_id >= latest:
            return cur.limit(0), latest
        prev_files = set(self.tio._manifest(self.table, snapshot_id)["files"])
        cur_files = [
            f for f in self.tio._manifest(self.table, latest)["files"]
            if f not in prev_files
        ]
        if not cur_files:
            return cur.limit(0), latest
        return spark.read.parquet(*cur_files), latest


def stream_pages(spark, tio: TableIO, table: str = "pages"):
    """Structured Streaming source over the table's data directory —
    each wave's new parquet files arrive as a micro-batch. Requires at
    least one committed snapshot (for the schema)."""
    import json
    import os

    from pyspark.sql.types import StructType

    snaps = tio.snapshots(table)
    if not snaps:
        raise FileNotFoundError(f"no snapshots for {table}")
    schema = StructType.fromJson(json.loads(tio._manifest(table, snaps[-1])["schema"]))
    data_dir = os.path.join(tio.root, table, "data")
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )


def wave_progress(lineage_rows: list[dict]) -> dict:
    """A8-style progress scalar from lineage rows."""
    if not lineage_rows:
        return {"crawled": 0, "waves": 0, "urls_per_sec": 0.0}
    crawled = lineage_rows[-1]["crawled_total"]
    wall_s = sum(r["wall_ms"] for r in lineage_rows) / 1000.0
    return {
        "crawled": crawled,
        "waves": len(lineage_rows),
        "urls_per_sec": round(crawled / wall_s, 2) if wall_s else 0.0,
    }


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  content_cols: tuple[str, ...] = ("content_hash",)
                  ) -> DataFrame:
    """Recrawl delta classification: full-outer join two crawl
    snapshots on ``key_col`` and label every key ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, any ``content_cols``
    differ) or ``unchanged`` — the incremental-recrawl planning step (a
    scheduler recrawls ``changed``+``added`` first, prunes ``removed``
    from the frontier; the reference's resume reloads everything,
    crawl_db.py, because a single-site crawler can afford to).

    NULL-safe comparison via eqNullSafe so a field going NULL <-> value
    counts as changed, matching intuition and the SQL twin's
    IS DISTINCT FROM.

    Scale shape: one full-outer hash join on the key — both sides
    shuffle once on ``key_col``; at 10^10 URLs both snapshots are
    bucketed Iceberg-style tables on the same key and the join is
    co-located with no exchange at all.
    """
    o = old.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_o_{c}") for c in content_cols])
    n = new.select(
        F.col(key_col).alias("_nk"),
        *[F.col(c).alias(f"_n_{c}") for c in content_cols])
    j = o.join(n, o["_k"] == n["_nk"], "full_outer")
    same = F.lit(True)
    for c in content_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    cls = (
        F.when(F.col("_k").isNull(), F.lit("added"))
        .when(F.col("_nk").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce(F.col("_k"), F.col("_nk")).alias(key_col),
        cls.alias("change"),
    )
