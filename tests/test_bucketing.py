"""Bucketed co-located joins: the seen-set layout for 10^10-URL runs.

Proves the property that matters at scale, from the physical plan:
joining two tables bucketed on the same key with the same bucket count
plans with ZERO Exchange operators, while the identical join over plain
parquet pays a shuffle on both sides."""

import pyspark.sql.functions as F
import pytest

from librecrawl_spark.storage.bucketed import (
    is_bucketed,
    read_table,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buck")
    seen = spark.range(20_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("seq"),
    )
    cand = spark.range(5_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/p/"), (F.col("id") * 3).cast("string")).alias("url"),
        (F.col("id") % 7).alias("depth"),
    )
    write_bucketed(seen, "seen_b", "url", N_BUCKETS, path=str(root / "seen"))
    write_bucketed(cand, "cand_b", "url", N_BUCKETS, path=str(root / "cand"))
    yield seen, cand
    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS cand_b")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _no_broadcast(spark):
    return {"spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false"}


def test_catalog_records_bucketing(spark, bucketed_pair):
    assert is_bucketed(spark, "seen_b", "url")
    assert is_bucketed(spark, "cand_b", "url")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    with _conf(spark, _no_broadcast(spark)):
        j = read_table(spark, "cand_b").join(read_table(spark, "seen_b"),
                                             "url", "left_anti")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it computes the right thing
        assert j.count() == read_table(spark, "cand_b").join(
            read_table(spark, "seen_b").hint("shuffle_hash"),
            "url", "left_anti").count()


def test_plain_parquet_join_pays_two_exchanges(spark, bucketed_pair, tmp_path):
    seen, cand = bucketed_pair
    seen.write.mode("overwrite").parquet(str(tmp_path / "seen_p"))
    cand.write.mode("overwrite").parquet(str(tmp_path / "cand_p"))
    with _conf(spark, _no_broadcast(spark)):
        j = spark.read.parquet(str(tmp_path / "cand_p")).join(
            spark.read.parquet(str(tmp_path / "seen_p")), "url", "left_anti")
        # two Exchange nodes in the tree (explain("formatted") prints each
        # node again in a numbered detail block, so count tree lines only)
        plan = _plan(j)
        assert plan.count("+- Exchange") + plan.count(":- Exchange") == 2, plan


def test_prepartitioned_seen_elides_join_exchange(spark):
    """The in-memory analog of the bucketed layout: a persisted seen set
    hash-partitioned on the join key (what plans/crawl.py maintains once
    the crawl enters the shuffle-hash regime, and what
    bench.bench_frontier_schedule's input mirrors) satisfies the
    anti-join's required distribution THROUGH the url->clean_url alias,
    so only the candidate side's keep-first aggregate exchange remains
    in the wave plan."""
    from librecrawl_spark.operators.frontier import anti_join_seen

    n_shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seen = spark.range(30_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 11).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"))
    cand = spark.range(9_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 11).cast("string"),
                 F.lit(".example/p/"), (F.col("id") * 2).cast("string"))
        .alias("clean_url"),
        F.col("id").alias("src_seq"))
    first = cand.groupBy("clean_url").agg(F.min("src_seq").alias("_p"))
    with _conf(spark, _no_broadcast(spark)):
        plain = _plan(anti_join_seen(first, seen.persist(), big=True))
        pre = seen.repartition(n_shuf, "url").persist()
        pre.count()
        part = _plan(anti_join_seen(first, pre, big=True))
    # plain: agg exchange + ENSURE exchange on the seen side; pre: the
    # ENSURE exchange is gone (the only remaining Exchange nodes are the
    # candidate agg's and the cached REPARTITION placement, which the
    # InMemoryTableScan serves without re-shuffling)
    assert "ENSURE_REQUIREMENTS" in plain.split("ShuffledHashJoin")[0] or \
        plain.count("ENSURE_REQUIREMENTS") >= 2, plain
    assert part.count("ENSURE_REQUIREMENTS") == plain.count("ENSURE_REQUIREMENTS") - 1, \
        f"pre-partitioned seen still re-exchanges:\n{part}"
    seen.unpersist()
    pre.unpersist()


class _conf:
    """Temporarily set session confs (restored on exit)."""

    def __init__(self, spark, kv: dict):
        self.spark, self.kv, self.old = spark, kv, {}

    def __enter__(self):
        for k, v in self.kv.items():
            self.old[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
