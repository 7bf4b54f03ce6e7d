"""Small standalone operators from the SURVEY §2 inventory."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def requires_js(pages_raw: DataFrame, pages_rendered: DataFrame,
                size_ratio: float = 1.1) -> DataFrame:
    """S4 (crawler.py:1141-1188): a page 'requires JS' when the rendered
    DOM differs from the raw HTML — md5 mismatch AND rendered size >
    ratio * raw size. Inputs: (url, body) for raw and rendered variants;
    all JVM-side (md5/length/join)."""
    raw = pages_raw.select(
        "url", F.md5(F.col("body")).alias("raw_hash"), F.length("body").alias("raw_size")
    )
    ren = pages_rendered.select(
        F.col("url"), F.md5(F.col("body")).alias("rendered_hash"),
        F.length("body").alias("rendered_size"),
    )
    return raw.join(ren, "url").select(
        "url", "raw_hash", "rendered_hash",
        (
            (F.col("raw_hash") != F.col("rendered_hash"))
            & (F.col("rendered_size") > F.col("raw_size") * size_ratio)
        ).alias("requires_js"),
    )


def homepage_of(pages: DataFrame, base_url: str) -> DataFrame:
    """W2 (crawler.py:1699-1737): exact base_url match wins, else the
    shortest-path 200 internal page; deterministic tie-break on URL."""
    exact = pages.filter(F.col("url").isin(base_url, base_url.rstrip("/") + "/"))
    if exact.limit(1).count() > 0:
        return exact.orderBy(F.length("url")).limit(1)
    path_len = F.length(F.regexp_replace("url", r"^https?://[^/]*", ""))
    return (
        pages.filter((F.col("status_code") == 200) & F.col("is_internal"))
        .orderBy(path_len.asc(), F.col("url").asc())
        .limit(1)
    )


def keyword_gap(our_keywords: DataFrame, competitor_keywords: DataFrame,
                key: str = "keyword"):
    """§2.10 competitor set-ops (competitor_keywords.py:152-246):
    gap = competitor minus ours; shared = intersect; opportunity =
    ours minus competitor. Native except/intersect."""
    ours = our_keywords.select(key)
    comp = competitor_keywords.select(key)
    return {
        "gap": comp.exceptAll(ours).distinct(),
        "shared": comp.intersect(ours),
        "opportunity": ours.exceptAll(comp).distinct(),
    }


def top_keywords(docs: DataFrame, text_col: str = "text", n: int = 2,
                 top_k: int = 20) -> DataFrame:
    """A9/W3 (keyword_analyzer.py:243-330): n-gram frequency top-k with
    density %. Tokenize -> n-gram via sequence/transform -> count ->
    row_number window."""
    toks = f"regexp_extract_all(lower({text_col}), '\\\\w+', 0)"
    # CASE guard: sequence(1, 0) counts DOWN to [1, 0], so docs with fewer
    # than n tokens would index element 0 and abort the job.
    grams = F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )
    exploded = docs.select(F.explode(grams).alias("gram"))
    total = exploded.count()
    counted = exploded.groupBy("gram").agg(F.count("*").alias("freq"))
    return (
        counted.orderBy(F.desc("freq"), F.asc("gram"))
        .limit(top_k)
        .withColumn("density_pct", F.round(F.col("freq") / F.lit(max(total, 1)) * 100, 4))
    )
