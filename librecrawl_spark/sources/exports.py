"""Exports + status queries (SURVEY.md §2.1 S12-S17, §2.4 A1/A8, §2.5 W6).

The reference flattens nested fields with type-specific rules before
CSV export (main.py:304-348): counts for lists-of-structs, joins for
string lists, JSON for maps. Re-expressed as one projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CSV_COLUMNS = [
    # main.py:311-330 export field list (engine-carried subset)
    "url", "status_code", "content_type", "size", "depth", "is_internal",
    "title", "meta_description", "h1", "word_count", "canonical_url",
    "robots", "lang", "internal_links", "external_links", "redirect_count",
]


def pages_export(pages: DataFrame) -> DataFrame:
    """Flattened projection for CSV/JSON export (S12/S13): list fields
    become counts or joined strings (main.py:304-348)."""
    cols = [c for c in CSV_COLUMNS if c in pages.columns]
    return pages.select(
        *cols,
        F.size("h1_list").alias("h1_count"),
        F.concat_ws(" | ", "h2").alias("h2_joined"),
        F.size("images").alias("image_count"),
        F.size("linked_from").alias("linked_from_count"),
        F.concat_ws(", ", "redirects").alias("redirect_chain_joined"),
    )


def write_pages_csv(pages: DataFrame, path: str) -> None:
    pages_export(pages).write.mode("overwrite").option("header", True).csv(path)


def write_pages_json(pages: DataFrame, path: str) -> None:
    pages_export(pages).write.mode("overwrite").json(path)


def write_pages_xml(pages: DataFrame, path: str, root: str = "urls",
                    row_tag: str = "url_entry") -> None:
    """S14 XML export (main.py:368-382): element per url per field.
    The reference collects to build the XML; same here (export-only
    path, bounded by the flattened projection)."""
    from xml.sax.saxutils import escape

    rows = pages_export(pages).collect()
    cols = rows[0].asDict().keys() if rows else []
    parts = [f"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<{root}>"]
    for r in rows:
        d = r.asDict()
        fields = "".join(
            f"<{c}>{escape('' if d[c] is None else str(d[c]))}</{c}>" for c in cols
        )
        parts.append(f"  <{row_tag}>{fields}</{row_tag}>")
    parts.append(f"</{root}>\n")
    with open(path, "w") as fh:
        fh.write("\n".join(parts))


def links_export(links: DataFrame) -> DataFrame:
    """S15 fixed-column links export (main.py:384-407)."""
    return links.select(
        "source_url", "target_url", "anchor_text", "is_internal",
        "nofollow", "placement", "scope", "target_status",
    )


def issues_export(issues: DataFrame) -> DataFrame:
    """S15 issues export (main.py:443-483)."""
    return issues.select("url", "type", "category", "issue", "details")


def crawl_stats(pages: DataFrame, seen: DataFrame, pending_count: int = 0) -> DataFrame:
    """A1/A8 (link_manager.py:260-267, crawler.py:567-576,632):
    discovered/crawled/depth counts + progress."""
    crawled = pages.count()
    discovered = seen.count()
    depth = pages.agg(F.max("depth")).collect()[0][0] or 0
    spark = pages.sparkSession
    return spark.createDataFrame(
        [(discovered, crawled, pending_count, depth,
          round(crawled / max(discovered, 1) * 100, 1))],
        schema="discovered long, crawled long, pending long, max_depth int, progress_pct double",
    )


def visualization_graph(pages: DataFrame, links: DataFrame, cap: int = 500):
    """W6 (main.py:1005-1061): first ``cap`` pages by discovery order +
    deduped edges among them."""
    nodes = pages.orderBy("seq").limit(cap).select(
        "url", "status_code", "depth", "title"
    )
    urls = nodes.select("url")
    edges = (
        links.join(urls.withColumnRenamed("url", "source_url"), "source_url", "left_semi")
        .join(urls.withColumnRenamed("url", "target_url"), "target_url", "left_semi")
        .select("source_url", "target_url")
        .dropDuplicates()
    )
    return nodes, edges


def pages_summary(pages: DataFrame) -> DataFrame:
    """S17 narrow projection for list views (crawl_db.py:531-589) —
    Catalyst prunes the parquet scan to these columns."""
    return pages.select(
        "url", "status_code", "title", "word_count", "depth", "is_internal"
    )


def paginate(df: DataFrame, order_col: str, limit: int, offset: int) -> DataFrame:
    """S16 ORDER BY ... LIMIT/OFFSET (crawl_db.py:488-529). offset() is
    native in Spark 3.4+."""
    return df.orderBy(F.desc(order_col)).offset(offset).limit(limit)
