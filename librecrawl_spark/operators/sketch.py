"""Distinct-count sketching for frontier-scale cardinality questions.

The reference answers "how many unique URLs have we seen?" with an
exact `SELECT COUNT(*)` over its SQLite url-hash table (crawl_db.py) —
fine at 10^5 rows, impossible as a cheap per-wave probe at the north
rule's 10^10-URL frontier. The standard scale answer is a cardinality
sketch. Spark ships HyperLogLog (`approx_count_distinct`), but its
binary sketch is engine-private: no other system can replay it, so a
DuckDB/pytest oracle cannot verify the estimate and two engines
cannot merge their sketches.

K-minimum-values (KMV / bottom-k, Bar-Yossef et al. 2002) is the
engine-portable alternative implemented here: hash every value to a
uniform 60-bit integer (md5 prefix — bit-identical in any engine),
keep the k smallest distinct hashes, and estimate

    D ≈ (k - 1) * 2^60 / h_(k)          (h_(k) = k-th smallest hash)

with relative error ~ 1/sqrt(k-2). Everything is deterministic: same
input set => same hashes => same k-th order statistic => same
estimate, in Spark, DuckDB, or a python transcription. The k-hash
bottom set is also a mergeable summary (union = k smallest of the
concatenation), which is how per-partition lineage sketches roll up.

Scale shape: one map-side hash projection, one `distinct` (the only
shuffle, partial-aggregated map-side), then `orderBy(h).limit(k)` —
Spark plans that as TakeOrderedAndProject (per-partition bottom-k +
driver merge of k*P rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 15 lowercase-hex chars of the md5 digest = 60 uniform bits; fits a
# signed 64-bit integer in every engine (no unsigned-overflow edge).
_HASH_BITS = 60
_HASH_SPACE = float(2 ** _HASH_BITS)  # 1152921504606846976.0 (exact double)


def kmv_hash(col) -> "F.Column":
    """The shared 60-bit value hash: md5 hex prefix as a long.

    DuckDB twin: ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT``;
    python twin: ``int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)``.
    """
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_bottom(df: DataFrame, col: str, k: int = 512) -> DataFrame:
    """The mergeable summary: the k smallest distinct value hashes."""
    return (
        df.select(kmv_hash(col).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 512) -> DataFrame:
    """One-row distinct-count estimate for ``df[col]``.

    Returns (k_used, kth_hash, est_distinct). When fewer than k
    distinct hashes exist the bottom set IS the value set and the
    estimate is the exact count (the standard KMV small-set fallback);
    otherwise the (k-1)/x_(k) order-statistic estimator. ``round(..., 4)``
    keeps the emitted double hash-stable across engines (the operands
    are bit-identical; the rounding is belt-and-braces).
    """
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                   / F.col("kth_hash").cast("double"))
    )
    return (
        kmv_bottom(df, col, k)
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
        .select("k_used", "kth_hash", F.round(est, 4).alias("est_distinct"))
    )


def kmv_distinct_by(df: DataFrame, group_col: str, col: str,
                    k: int = 512) -> DataFrame:
    """Per-group KMV distinct estimate — "distinct URLs per host" over a
    10^10-row frontier without a per-host exact COUNT(DISTINCT) (whose
    hash explosion is exactly what a sketch avoids). Returns one row per
    group: (group_col, k_used, kth_hash, est_distinct).

    Shape: distinct (group, hash) pairs (one shuffle, map-side partial),
    then a bounded per-group bottom-k window — the same top-k-per-group
    plan as W3, output k rows per group max. The estimator and its
    small-group exact fallback are identical to kmv_distinct.
    """
    from pyspark.sql import Window

    d = (
        df.select(F.col(group_col), kmv_hash(col).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                   / F.col("kth_hash").cast("double"))
    )
    return (
        d.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(group_col)
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
        .select(group_col, "k_used", "kth_hash",
                F.round(est, 4).alias("est_distinct"))
    )


def kmv_merge(bottoms: DataFrame, k: int = 512) -> DataFrame:
    """Merge any number of KMV bottom-k summaries (unioned ``kmv_bottom``
    outputs, possibly from different partitions, waves, or engines) into
    one estimate — the property that makes KMV a distributed sketch: the
    k smallest distinct hashes of a union are a subset of the union of
    each side's k smallest, so merging loses nothing. This is how
    per-partition lineage sketches roll up to a crawl-wide distinct
    count without touching row data again.
    """
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                   / F.col("kth_hash").cast("double"))
    )
    return (
        bottoms.select("h").distinct().orderBy("h").limit(k)
        .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
        .select("k_used", "kth_hash", F.round(est, 4).alias("est_distinct"))
    )
