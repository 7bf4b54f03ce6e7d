"""Structured Streaming operators vs their batch twins.

Feeds the sf0.001 events table through readStream as three time-ordered
micro-batches (maxFilesPerTrigger=1, availableNow) and asserts each
streaming operator converges to exactly the batch answer:

- tumbling_counts (watermark + window agg, complete mode)
- sessionize_stateful (applyInPandasWithState, update mode) vs the
  batch lag-window sessionization (the events_sessionize driver query)
- session_window batch rollup vs a manual lag-based oracle
"""

import os
import shutil
import time

import pytest
from pyspark.sql import Window, functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """sf0.001 events split into 3 parquet files by event-time range,
    with ascending mtimes so readStream replays them in time order."""
    root = str(tmp_path_factory.mktemp("events_stream"))
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # split on global event time so the three files replay in time order
    tcuts = e.select(
        F.expr("percentile(cast(cast(ts as timestamp) as double), array(0.3333, 0.6667))")
    ).collect()[0][0]
    parts = [
        e.filter(F.col("ts").cast("timestamp").cast("double") <= tcuts[0]),
        e.filter((F.col("ts").cast("timestamp").cast("double") > tcuts[0])
                 & (F.col("ts").cast("timestamp").cast("double") <= tcuts[1])),
        e.filter(F.col("ts").cast("timestamp").cast("double") > tcuts[1]),
    ]
    files = []
    for i, p in enumerate(parts):
        d = os.path.join(root, f"b{i}")
        p.coalesce(1).write.parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = os.path.join(root, f"part-{i}.parquet")
        os.rename(os.path.join(d, f), dst)
        os.utime(dst, (time.time() + i, time.time() + i))
        files.append(dst)
    for i in range(3):
        shutil.rmtree(os.path.join(root, f"b{i}"))
    return root, e.schema


def _stream(spark, root, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )


def _run_to_memory(sdf, name, mode):
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return q


def test_tumbling_counts_stream_matches_batch(spark, event_files):
    from librecrawl_spark.streaming.windows import tumbling_counts

    root, schema = event_files
    stream = _stream(spark, root, schema)
    _run_to_memory(tumbling_counts(stream), "tumble", "complete")
    got = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("select * from tumble").collect()
    }
    batch = tumbling_counts(spark.read.schema(schema).parquet(root))
    want = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == want and len(want) > 10


def test_stateful_sessionize_matches_batch(spark, event_files):
    from librecrawl_spark.streaming.windows import sessionize_stateful

    root, schema = event_files
    stream = _stream(spark, root, schema)
    _run_to_memory(sessionize_stateful(stream), "sess", "update")
    # totals are monotone per user; the final state is the max
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "select user_id, max(n_sessions) n_sessions, max(n_events) n_events "
            "from sess group by user_id"
        ).collect()
    }

    # batch twin: the events_sessionize lag-window plan (strict gap >)
    e = spark.read.schema(schema).parquet(root)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts) / 1000000.0")
    newsess = F.when(F.col("prev_ts").isNull() | (gap > 1800), 1).otherwise(0)
    batch = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("ns", newsess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert got == want and len(want) > 10


def test_session_window_batch_matches_manual(spark):
    from librecrawl_spark.streaming.windows import user_session_counts

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in user_session_counts(e).collect()
    }
    # manual oracle mirroring session_window's merge rule: new session
    # iff gap >= 30min (window end is exclusive)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts) / 1000000.0")
    newsess = F.when(F.col("prev_ts").isNull() | (gap >= 1800), 1).otherwise(0)
    manual = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("ns", newsess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in manual.collect()}
    assert got == want and len(want) > 10
