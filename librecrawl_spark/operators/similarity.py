"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k neighbors of a query vector.
  The dot product runs JVM-side via ``aggregate(zip_with(...))`` in
  double precision with sequential accumulation — bit-compatible with
  the DuckDB oracle's ordered list reduction.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (sign of dot with H deterministic pseudo-random planes) shrink the
  candidate set; exact re-rank within probed buckets. At 100 TB the
  bucket join replaces the full scan; here H is small and deterministic.
- ``embedding_near_dups``: all pairs with cosine >= threshold, blocked
  by LSH bucket (near-dup dedup for embedding columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a: str, b: str) -> F.Column:
    """Sequential double-precision dot product, JVM-side."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> F.Column:
    return F.expr(
        f"sqrt(aggregate({a}, cast(0.0 as double), "
        f"(acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )


def with_cosine(df: DataFrame, query: list[float], vec_col: str = "embedding") -> DataFrame:
    """Add cos_sim vs a literal query vector (broadcast as a literal array)."""
    qlit = "array(" + ",".join(f"cast({float(v)!r} as double)" for v in query) + ")"
    qnorm = sum(float(v) * float(v) for v in query) ** 0.5
    dot = F.expr(
        f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> cast(x as double) * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return df.withColumn(
        "cos_sim",
        F.round(dot / (_norm(vec_col) * F.lit(qnorm)), 6),
    )


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine. orderBy+limit compiles to a
    distributed TakeOrdered (per-partition top-k then merge — no global
    sort shuffle)."""
    return (
        with_cosine(df, query, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no numpy RNG
    state): portable and stable across engines/processes."""
    planes = []
    state = 0x5EED
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8,
               vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature: bucket = bit-packed signs of the dot
    products with n_planes fixed hyperplanes."""
    planes = _hyperplanes(dim, n_planes)
    bucket = None
    for i, p in enumerate(planes):
        plit = "array(" + ",".join(f"cast({v!r} as double)" for v in p) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {plit}, (x, y) -> cast(x as double) * y), "
            f"cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    n_planes: int = 6, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """ANN: restrict the exact re-rank to vectors in the query's LSH
    bucket (single-probe). Recall < 1 by construction; the scale path
    when a full scan is too expensive."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qbucket |= 1 << i
    bucketed = lsh_bucket(df, dim, n_planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("lsh_bucket") == qbucket), query, k, vec_col, id_col
    )


def embedding_near_dups(df: DataFrame, dim: int, threshold: float = 0.95,
                        n_planes: int = 6, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, candidate-blocked by
    LSH bucket equality (high-cosine pairs land in the same bucket with
    high probability; multi-probe would push recall higher)."""
    b = lsh_bucket(df, dim, n_planes, vec_col).select(
        F.col(id_col), F.col(vec_col), "lsh_bucket"
    )
    a = b.alias("a")
    c = b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    dot = F.expr(
        f"aggregate(zip_with(a.{vec_col}, b.{vec_col}, "
        f"(x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = F.expr(
        f"sqrt(aggregate(a.{vec_col}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    nb = F.expr(
        f"sqrt(aggregate(b.{vec_col}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    # admit on the UNROUNDED cosine (same rule as exact_near_dups, so the
    # LSH path never admits/drops a pair the exact baseline would not at
    # the rounding boundary); round only the emitted display value
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (dot / (na * nb)).alias("_raw"),
        )
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("cos_sim"))
    )

def ivf_topk(df: DataFrame, qdf: DataFrame, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-Flat approximate nearest neighbors (inverted-file index).

    Index: a coarse quantizer of ``n_centroids`` list centroids; every
    vector joins the broadcast centroid table and is assigned to its
    max-cosine centroid via a ``min_by`` hash aggregate — one codegen
    pass, no shuffle of the vector payload beyond the aggregate's own
    partial/final exchange. Search: rank the centroids against the
    query, probe the ``n_probe`` nearest lists only, exact cosine
    re-rank inside them (distributed TakeOrdered). The scanned fraction
    is ~``n_probe``/``n_centroids`` of the corpus — the standard
    IVF-Flat trade (recall < 1 when a true neighbor's list is not
    probed; raise n_probe toward n_centroids for recall 1).

    The quantizer here is deterministic — the ``n_centroids`` vectors
    with the smallest ids — so the result is engine-portable and the
    DuckDB oracle replays it exactly. At 100 TB you would train a
    k-means codebook instead; the plumbing (broadcast centroids,
    argmax-cosine assignment, probe-pruned exact re-rank) is unchanged
    — swap the centroid DataFrame. Assignment/probe scores are rounded
    to 6 decimals before the argmax so near-ties break identically
    (then by centroid id) in every engine.

    ``qdf``: one row, one column ``qe`` holding the query vector.
    """
    cent = (df.orderBy(id_col).limit(n_centroids)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"))
            .persist())

    def _cos(a: str, b: str) -> F.Column:
        return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)

    assigned = (
        df.select(id_col, vec_col)
        .join(F.broadcast(cent))
        .select(id_col, F.col("cid"), _cos(vec_col, "ce").alias("_c"))
        .groupBy(id_col)
        .agg(F.min_by("cid", F.struct((-F.col("_c")).alias("n"), "cid")).alias("cid"))
    )
    probed = (
        cent.join(F.broadcast(qdf))
        .select("cid", _cos("ce", "qe").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    return (
        df.join(assigned.join(F.broadcast(probed), "cid").select(id_col), id_col)
        .join(F.broadcast(qdf))
        .select(id_col, _cos(vec_col, "qe").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def exact_near_dups(df: DataFrame, threshold: float = 0.95,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold — exact O(n^2)
    baseline (all unordered pairs, double-precision math, round-6 like
    cosine_topk). This is the recall-1 reference the LSH-blocked
    ``embedding_near_dups`` is measured against; use it when n is small
    enough that n^2/2 dot products are affordable (the 100 TB path is
    the LSH variant)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = F.expr(
        "sqrt(aggregate(va, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    nb = F.expr(
        "sqrt(aggregate(vb, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    # admission filters on the UNROUNDED value (reference-exact: a
    # 0.94996 pair must NOT pass at 0.95); only the emitted display
    # value is rounded (6 decimals, same as cosine_topk). Summation
    # reorder between engines perturbs a 64-dim unit dot by ~1e-14,
    # far below both the round-6 display step and any realistic
    # distance-to-threshold, so cross-engine hashes stay stable.
    return (
        pairs.select("id_a", "id_b",
                     (dot / (na * nb)).alias("_raw"))
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("cos_sim"))
    )


def kmeans_codebook(df: DataFrame, k: int = 8, iters: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column — the
    codebook-training step ``ivf_topk``'s docstring defers to for the
    100 TB path (train the coarse quantizer, then swap its centroid
    DataFrame in).

    Init is the same deterministic seed as ``ivf_topk`` (the ``k``
    smallest-id vectors), so the whole run is engine-portable: the
    DuckDB oracle replays every iteration exactly. Each iteration:

    1. assignment — broadcast the ``k`` centroids against the corpus,
       argmax cosine via a ``min_by`` hash aggregate (scores rounded to
       6 decimals before the argmax, near-ties break by centroid id);
    2. update — ``posexplode`` the assigned vectors, per-(cluster, dim)
       ``avg`` rounded to 6 decimals (so both engines carry identical
       centroids into the next iteration), reassembled with an ordered
       ``array_sort(collect_list(struct(pos, m)))``.

    A centroid that attracts no members drops out (standard Lloyd's
    empty-cluster shrink); iteration count is a fixed small constant so
    the driver loop only grows the lazy plan, never collects vectors.

    Scale shape per iteration: one broadcast join (k rows) + one
    groupBy(id) argmax + one posexplode/groupBy(cluster, dim) — all
    map-side-combinable aggregates; the corpus shuffles only on its own
    id/(cluster, dim) keys, never pairwise. Returns (``id_col``,
    ``cluster``) — the final assignment; join it back for members, or
    rebuild the centroid frame the same way for the quantizer.
    """
    data = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    cent = (
        df.orderBy(id_col).limit(k)
        .select(F.col(id_col).alias("cid"),
                F.col(vec_col).cast("array<double>").alias("ce"))
    )
    assigned = None
    for it in range(max(iters, 1)):
        score = F.round(_dot("_v", "ce") / (_norm("_v") * _norm("ce")), 6)
        assigned = (
            data.join(F.broadcast(cent))
            .select(id_col, "cid", score.alias("_c"))
            .groupBy(id_col)
            .agg(F.min_by(
                "cid", F.struct((-F.col("_c")).alias("n"), "cid")).alias("cid"))
        )
        if it < iters - 1:
            cent = (
                data.join(assigned, id_col)
                .select("cid", F.posexplode("_v").alias("pos", "val"))
                .groupBy("cid", "pos")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .groupBy("cid")
                .agg(F.array_sort(
                    F.collect_list(F.struct("pos", "m"))).alias("_pm"))
                .select("cid", F.col("_pm").getField("m").alias("ce"))
            )
    return assigned.select(F.col(id_col), F.col("cid").alias("cluster"))
