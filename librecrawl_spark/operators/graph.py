"""Link-graph analytics: PageRank over the crawl's internal link graph.

The reference exposes the link graph (link_manager.py builds
source/target edges; main.py's visualization endpoint serves it) but
computes no authority metric over it — at 100 TB the first thing a
crawl corpus feeds is exactly this: a link-authority score per URL for
crawl prioritization and quality weighting (the production analogue of
the reference's per-page internal-link counts, issue_detector.py's
Links family).

Implementation is the classic distributed power iteration expressed as
DataFrame joins — no GraphX/RDD, no driver-side adjacency: ranks live
in a (node, pr) frame, each round joins edges to ranks, groupBy(dst)
partial-aggregates the contributions (map-side combine), and dangling
mass redistributes via a 1-row broadcast aggregate. Iteration count is
a fixed small constant with per-round round-8 so every engine replays
the identical fixpoint prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85,
             round_to: int = 8, checkpoint: bool = True) -> DataFrame:
    """Power-iteration PageRank over ``edges``; returns (node, pr).

    Node set = every id appearing as src or dst. Per round::

        pr'(v) = (1 - d)/N + d * (sum_{u->v} pr(u)/outdeg(u)
                                  + dangling_mass/N)

    with dangling mass from sink nodes (no out-edges) spread uniformly
    — the standard stochastic-matrix completion, so total rank stays 1.
    Ranks are rounded to ``round_to`` decimals each round: the per-node
    contribution sum is order-dependent in floating point, and rounding
    at every round keeps a DuckDB replay of the same unrolled
    iterations hash-identical (same trick as kmeans_codebook's round-6
    centroids).

    Scale shape per round: one hash join of edges to the rank frame on
    src + one groupBy(dst) with partial aggregation, plus two 1-row
    broadcast aggregates (dangling mass, N). Parallel edges are kept
    (a page linking twice contributes twice, matching the raw links
    table); pre-``distinct()`` the edges for simple-graph semantics.
    The rank frame is O(V) and lineage is truncated per round via
    localCheckpoint so the plan stays O(1)-deep at any iteration count
    (same rationale as dedup.connected_components).

    ``checkpoint=False`` keeps the full per-round lineage in the plan —
    results are identical; it exists so a plan audit can explain() one
    unrolled round (checkpointing collapses the plan to an ExistingRDD
    scan, hiding the per-round joins from explain).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        nodes.unpersist()
        return e.select(F.col("s").alias("node"),
                        F.lit(0.0).alias("pr")).limit(0)
    # derived from e, so rename the key: keeps every downstream join
    # unambiguous (outdeg and e share lineage)
    outdeg = (e.groupBy("s").agg(F.count("*").alias("deg"))
              .select(F.col("s").alias("_on"), "deg"))
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), round_to).alias("pr"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        with_deg = ranks.join(outdeg, ranks["node"] == F.col("_on"), "left")
        # dangling mass: rank held by sink nodes this round (1-row agg)
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
        contrib = (
            e.join(with_deg.filter(F.col("deg").isNotNull())
                   .select(F.col("node").alias("_wn"), "pr", "deg"),
                   e["s"] == F.col("_wn"))
            .select(F.col("d").alias("node"),
                    (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n_nodes))),
                    round_to,
                ).alias("pr"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    out = ranks
    nodes.unpersist()
    return out


def bfs_distances(edges: DataFrame, seeds: DataFrame, src: str = "src",
                  dst: str = "dst", seed_col: str = "node",
                  max_hops: int = 4) -> DataFrame:
    """Multi-source BFS: minimum link distance from any seed, bounded
    at ``max_hops``. Returns (node, dist) for every reached node —
    the link-depth metric a crawl audit compares against the frontier's
    fetch depth (a page N clicks from the seed that the crawler only
    found at depth >> N signals a discovery gap; pages unreached within
    max_hops are the orphan candidates the reference's sitemap
    cross-ref hints at, issue_detector.py:1536's "in sitemap, never
    linked").

    Classic distributed frontier expansion: per hop, one hash join of
    the current frontier to the edge list on src + one left-anti join
    against the known set — no driver-side adjacency, no recursion in
    the plan (each round's frame is localCheckpoint-truncated so plan
    depth stays O(1), as pagerank does). First-reach distance is the
    minimum distance by BFS invariant, so no per-node min aggregate is
    ever needed. The known set is O(V); each round shuffles only the
    frontier-adjacent edges.

    DuckDB twin: a recursive CTE over (node, dist) with ``dist <
    max_hops`` recursion guard + ``min(dist)`` rollup (UNION dedup
    keeps cyclic graphs finite).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    known = (seeds.select(F.col(seed_col).alias("node"),
                          F.lit(0).alias("dist"))
             .distinct())
    frontier = known
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["s"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(known.select("node"), "node", "left_anti")
            .select("node", F.lit(hop).alias("dist"))
        )
        known = known.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return known


def degree_histogram(edges: DataFrame, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Log2-binned in/out-degree distribution of the link graph — the
    first diagnostic a crawl corpus gets (power-law exponent eyeball,
    hub detection, spider-trap symptom: a bucket far off the power-law
    line). One row per (direction, bucket=floor(log2(degree))) with the
    node count and min/max degree in the bucket.

    Scale shape: two groupBy passes per direction (node-level count,
    then bucket-level rollup). The node-level aggregation partial-
    aggregates map-side; the bucket rollup is over at most ~64 rows per
    direction worth of distinct buckets after the first shuffle, so the
    second exchange is negligible. No windows, no driver state.
    """
    def one(col: str, name: str) -> DataFrame:
        deg = edges.groupBy(F.col(col).alias("node")).agg(
            F.count("*").alias("degree"))
        bucket = F.floor(F.log2("degree")).cast("int")
        return (deg.groupBy(bucket.alias("bucket"))
                .agg(F.count("*").alias("n_nodes"),
                     F.min("degree").alias("min_degree"),
                     F.max("degree").alias("max_degree"))
                .select(F.lit(name).alias("direction"), "bucket",
                        "n_nodes", "min_degree", "max_degree"))

    return one(src, "out").unionByName(one(dst, "in"))


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iters: int = 2, round_to: int | None = 8,
         checkpoint: bool = True) -> DataFrame:
    """Kleinberg HITS hubs & authorities over the link graph — the
    complement of pagerank for crawl analytics: authorities are the
    pages good hubs point at (content worth fetching first), hubs are
    the directory/index pages whose out-links are worth expanding (the
    reference's visualization endpoint surfaces exactly these two node
    roles informally via in/out-degree; main.py's link graph).

    L1-normalized power iteration: per round, authority(v) = Σ_{u→v}
    hub(u) then normalize to Σ=1, hub(u) = Σ_{u→v} authority(v) then
    normalize — L1 instead of the textbook L2 so a SQL replay needs no
    sqrt of a sum of squares, and with per-round ``round_to`` rounding
    so any engine replays the identical fixpoint prefix (same trick as
    pagerank / kmeans_codebook). Parallel edges contribute twice,
    matching pagerank's raw-links convention.

    Scale shape per round: two edge-to-score hash joins + two
    groupBy partial aggregations + two 1-row broadcast normalizers.
    Scores are O(V); lineage truncated per round via localCheckpoint.

    Precondition for replay-stable rounding: n_nodes ≲ 10^round_to,
    else per-round rounding collapses scores toward 0. Beyond that the
    init falls back to the unrounded 1/n and every normalizer division
    is guarded (Σ==0 → hold the uniform distribution instead of
    NaN/Inf); pass ``round_to=None`` to disable rounding entirely for
    10^9+-node graphs where cross-engine replay parity is not needed.
    Returns (node, hub, authority).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        nodes.unpersist()
        return e.select(F.col("s").alias("node"), F.lit(0.0).alias("hub"),
                        F.lit(0.0).alias("authority")).limit(0)
    uniform = 1.0 / n_nodes
    init = uniform if round_to is None else round(uniform, round_to)
    if init == 0.0:
        init = uniform  # n ≳ 10^round_to: rounding would zero the start

    def _rnd(col):
        return col if round_to is None else F.round(col, round_to)

    def _norm(raw):
        # guarded L1 normalize: if rounding flushed every score to 0
        # (Σ _raw == 0) hold the uniform distribution instead of 0/0.
        return F.when(
            F.coalesce(F.col("_t"), F.lit(0.0)) != 0.0,
            _rnd(F.coalesce(raw, F.lit(0.0)) / F.col("_t")),
        ).otherwise(F.lit(init))

    h = nodes.select("node", F.lit(init).alias("hub"))
    a = None
    for _ in range(iters):
        araw = (
            e.join(h.select(F.col("node").alias("_hn"), "hub"),
                   e["s"] == F.col("_hn"))
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("hub").alias("_raw"))
        )
        atot = araw.agg(F.sum("_raw").alias("_t"))
        a = (
            nodes.join(araw, "node", "left")
            .join(F.broadcast(atot))
            .select("node", _norm(F.col("_raw")).alias("authority"))
        )
        if checkpoint:
            a = a.localCheckpoint(eager=False)
        hraw = (
            e.join(a.select(F.col("node").alias("_an"), "authority"),
                   e["d"] == F.col("_an"))
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum("authority").alias("_raw"))
        )
        htot = hraw.agg(F.sum("_raw").alias("_t"))
        h = (
            nodes.join(hraw, "node", "left")
            .join(F.broadcast(htot))
            .select("node", _norm(F.col("_raw")).alias("hub"))
        )
        if checkpoint:
            h = h.localCheckpoint(eager=False)
    out = h.join(a, "node").select("node", "hub", "authority")
    nodes.unpersist()
    return out
