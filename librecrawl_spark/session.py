"""SparkSession factory with scale-oriented defaults.

Defaults mirror what we would submit on a 1000-executor cluster via
``spark-submit --py-files``: AQE on (runtime re-plan + skew-join
splitting), Arrow on (every Python-side transform is a vectorized
pandas UDF), and a shuffle-partition count sized to the local core
count (on a real cluster this is set to ~2-3x total cores or left to
AQE coalescing).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "librecrawl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing sizes on COMPRESSED shuffle bytes; crawl text
        # compresses ~10x, so the default 1MB minPartitionSize floor
        # coalesces a text-heavy Arrow-UDF stage to half the cores (the
        # per-row Python cost AQE can't see). 64k lets parallelismFirst's
        # totalSize/defaultParallelism target win: partitions track core
        # count, never exceed it per stage (measured: extract stage 16 ->
        # 48 partitions at local[32], 29k -> 46k docs/s same window).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # broadcast threshold stays at Spark's default here; hot spots
        # that profit from a bigger hash side (the frontier wave's
        # seen-set anti-join, bench analytics) raise it locally via
        # broadcast_threshold()/WAVE_BROADCAST_THRESHOLD. A global 64MB
        # default risked OOM on small-memory drivers: the hash-relation
        # build transiently needs several times the estimated size, and
        # AQE reconsiders only on size estimates, not memory pressure.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # shuffle/spill on tmpfs when available: the sandbox's virtual disk
    # serializes concurrent shuffle writers (measured 4.7x degradation at
    # 32 threads); on a real cluster this is per-executor local NVMe
    shm = os.environ.get("SPARK_LOCAL_DIRS_OVERRIDE", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    except OSError:
        pass
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


# 64MB hash side: keeps the seen-set anti-join and dimension joins
# shuffle-free far longer (wave bench: 19.1s -> 12.6s at 1M seen rows).
# Applied per-scope, not globally — see broadcast_threshold().
WAVE_BROADCAST_THRESHOLD = 64 * 1024 * 1024


@contextmanager
def broadcast_threshold(spark: SparkSession, nbytes: int = WAVE_BROADCAST_THRESHOLD):
    """Temporarily raise spark.sql.autoBroadcastJoinThreshold for a
    scope whose executors are known to hold the hash side comfortably
    (the threshold is read at query planning time, so it governs every
    action triggered inside the ``with`` body)."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, str(nbytes))
    try:
        yield
    finally:
        spark.conf.set(key, old)
