"""robots.txt / llms.txt linting (SURVEY.md §2.1 S7/S8, §2.7 C16).

Transcriptions of the reference's validators re-expressed as native
split/posexplode/when plans — one row per lint finding.

- robots lint: crawler.py:1562-1606 (syntax validation of directives)
- llms.txt lint: llms_parser.py:81-112 (content-type + H1-title checks)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_ROBOTS_DIRECTIVES = (
    "user-agent", "disallow", "allow", "crawl-delay", "sitemap", "host",
    "clean-param", "request-rate", "visit-time", "noindex",
)


def lint_robots(hosts: DataFrame) -> DataFrame:
    """hosts(host, robots_txt) -> (host, line_no, line, finding).
    Checks per crawler.py:1562-1606: unknown directives, missing colon,
    disallow/allow values not starting with / or *, crawl-delay not
    numeric."""
    lines = hosts.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("line_no", "line"),
    ).withColumn("trimmed", F.trim("line"))
    content = lines.filter(
        (F.length("trimmed") > 0) & ~F.col("trimmed").startswith("#")
    )
    directive = F.lower(F.trim(F.regexp_extract("trimmed", r"^([^:]*)", 1)))
    value = F.trim(F.regexp_extract("trimmed", r"^[^:]*:(.*)$", 1))
    has_colon = F.col("trimmed").contains(":")
    known = directive.isin(*_ROBOTS_DIRECTIVES)
    finding = (
        F.when(~has_colon, F.lit("missing ':' separator"))
        .when(~known, F.concat(F.lit("unknown directive: "), directive))
        .when(
            directive.isin("disallow", "allow")
            & (F.length(value) > 0)
            & ~value.startswith("/") & ~value.startswith("*"),
            F.lit("path should start with / or *"),
        )
        .when(
            (directive == "crawl-delay") & ~value.rlike(r"^\d+(\.\d+)?$"),
            F.lit("crawl-delay is not numeric"),
        )
    )
    return (
        content.withColumn("finding", finding)
        .filter(F.col("finding").isNotNull())
        .select("host", "line_no", "line", "finding")
    )


def lint_llms_txt(docs: DataFrame, text_col: str = "llms_txt") -> DataFrame:
    """docs(host, llms_txt) -> (host, finding). Checks per
    llms_parser.py:81-112: empty body, missing H1 title line ('# ...'),
    suspiciously short content, HTML instead of markdown."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    first_lines = F.slice(F.split(t, "\n"), 1, 5)
    has_h1 = F.exists(first_lines, lambda l: F.trim(l).rlike(r"^# \S"))
    findings = F.array_compact(
        F.array(
            F.when(F.length(F.trim(t)) == 0, F.lit("empty llms.txt")),
            F.when((F.length(F.trim(t)) > 0) & ~has_h1,
                   F.lit("missing H1 title line ('# Site Name')")),
            F.when((F.length(F.trim(t)) > 0) & (F.length(t) < 50),
                   F.lit("content suspiciously short (<50 chars)")),
            F.when(F.lower(t).contains("<html"), F.lit("llms.txt contains HTML, expected markdown")),
        )
    )
    return docs.select("host", F.explode(findings).alias("finding"))
