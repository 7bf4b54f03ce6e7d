"""Deduplication operators for training-data pipelines at 100 TB scale.

Five families, all shuffle-conscious:

- exact:        hash-groupBy on a content fingerprint (one shuffle).
- minhash_lsh:  shingle -> K minhash signatures -> band buckets ->
                within-bucket candidate join. Hash primitive = md5 hex
                string min per seeded permutation — deterministic and
                bit-identical in the DuckDB oracle (portable across
                engines, unlike xxhash64).
- simhash:      16-bit sign-sum sketch over token md5 nibbles; near-dups
                share the sketch (or differ by <=1 nibble at query time).
- ngram_jaccard: blocked pairwise Jaccard over 3-token shingle sets —
                the provably-lossless blocked version of LibreCrawl's
                O(n^2) duplicate-content pass
                (/root/reference/src/core/issue_detector.py:1299-1431):
                pairs sharing no shingle have J=0 and can never reach
                the threshold, so the shingle-join block loses nothing.
- embedding near-dup: see similarity.py (cosine >= threshold).

Every function returns a deterministic DataFrame with aliased columns so
the DuckDB oracles in __spark_entry__ hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MINHASH = 8           # permutations
N_BANDS = 4             # 2 rows/band
SHINGLE_K = 3


def exact_dups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5 of normalized text, groups with >1 doc.
    One shuffle; partial aggregation map-side."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(F.col("doc_id"), F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def _shingles(text_col: str, k: int = SHINGLE_K):
    """k-token shingles as strings, via tokens + transform/slice —
    JVM-side higher-order functions, no UDF."""
    return F.expr(
        f"""
        array_distinct(
          transform(
            sequence(1, greatest(size(regexp_extract_all({text_col}, '\\\\w+', 0)) - {k - 1}, 0)),
            i -> concat_ws(' ', slice(regexp_extract_all({text_col}, '\\\\w+', 0), i, {k}))
          )
        )
        """
    )


def shingle_sets(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    return df.select("doc_id", _shingles(text_col, k).alias("shingles"))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: for seed i, sig_i = min over shingles of
    md5(i || ':' || shingle) — lexicographic min over hex strings is a
    valid uniform permutation min and is engine-portable."""
    out = df.select("doc_id", _shingles(text_col).alias("sh")).filter(F.size("sh") > 0)

    def mh(i: int):
        # NB: the lambda must be unary — a binary lambda is interpreted by
        # Spark's transform() as (element, index)
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")

    return out.select("doc_id", *[mh(i) for i in range(n_hashes)])


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           n_hashes: int = N_MINHASH, n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    The band join shuffles on the band key only — never a cross join."""
    sig = minhash_signatures(df, text_col, n_hashes)
    rows_per_band = n_hashes // n_bands
    bands = [
        F.concat_ws("|", F.lit(str(b)),
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*bands)).alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash: bit i = sign of sum over tokens of (+1 if the i-th
    hex nibble of md5(token) >= 8 else -1). Engine-portable (md5 + CASE
    arithmetic) and fully vectorized JVM-side."""
    toks = F.expr(f"regexp_extract_all({text_col}, '\\\\w+', 0)")
    ex = df.select("doc_id", F.explode(toks).alias("tok"))
    h = F.md5(F.col("tok"))
    bit_sums = [
        F.sum(
            F.when(F.substring(h, i + 1, 1).isin(*list("89abcdef")), 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(16)
    ]
    agg = ex.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(16):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i)
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs sharing an identical 16-bit simhash (near-dup at this sketch
    granularity): groupBy sketch."""
    return (
        simhash(df, text_col)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        threshold: float = 0.5, k: int = SHINGLE_K) -> DataFrame:
    """Pairwise n-gram Jaccard >= threshold via the shingle-inverted-index
    block (lossless: J>0 requires a shared shingle). At scale the hot
    shingles are capped upstream (stopword shingles dropped by a doc-freq
    filter) — here the corpus is synthetic and bounded.

    |A ∩ B| from the shingle join; |A ∪ B| = |A| + |B| - |A∩B|.
    Mirrors the pair *semantics* of the reference's duplicate-content
    detector (issue_detector.py:1299-1431) without the O(n^2) scan.
    """
    sh = shingle_sets(df, text_col, k).filter(F.size("shingles") > 0)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
