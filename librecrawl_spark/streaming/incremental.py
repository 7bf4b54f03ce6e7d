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


def changelog_compact(log: DataFrame, key_col: str = "url",
                      ver_col: str = "wave", op_col: str = "op") -> DataFrame:
    """Changelog -> latest-state compaction (last-writer-wins upsert):
    the merge step an incremental recrawl runs to fold a stream of
    per-wave upsert/delete records into the current corpus snapshot.
    ``op`` is 'upsert' or 'delete'; the newest record per key wins and
    a winning delete drops the key from the output.

    Plan shape: one hash aggregation — max_by(struct) keep-newest per
    key with map-side partial aggregation (NO per-key window/sort, so a
    hot key that received millions of updates still partial-aggregates
    on the map side instead of sorting one huge partition), then a
    codegen filter on the winner's op. One shuffle total, same as the
    theoretical minimum for a keyed merge. Ties on (ver) break by op
    DESC ('upsert' > 'delete' lexicographically) then payload-free
    determinism is the caller's contract (the engine's changelogs never
    emit two ops for one key in one wave).
    """
    payload = [c for c in log.columns if c not in (key_col, ver_col, op_col)]
    winner = F.max_by(
        F.struct(F.col(op_col).alias("_op"),
                 *[F.col(c) for c in payload]),
        F.struct(F.col(ver_col), F.col(op_col)),
    ).alias("_w")
    out = (log.groupBy(F.col(key_col))
           .agg(winner, F.max(ver_col).alias(ver_col))
           .filter(F.col("_w._op") == "upsert"))
    return out.select(
        key_col, ver_col,
        *[F.col(f"_w.{c}").alias(c) for c in payload])
