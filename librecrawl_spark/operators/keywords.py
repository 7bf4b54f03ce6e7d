"""Keyword cannibalization detection (reference §2.10).

Transcribes the deterministic core of the reference's cannibalization
detector (keyword/cannibalization.py:184-264 page-type heuristic,
:266-297 primary-keyword gate, :300-331 keyword filter, :604-688
severity rules, :786-860 risk scoring + primary-page selection) as one
explode-free DataFrame plan.

Reference architecture vs this one: the reference fetches ≤30 pages,
builds a ``keyword_to_pages`` dict in driver memory and loops it
(cannibalization.py:732-descent); the AI intent classification
(ai_service.classify_intent) only decorates the report — none of the
flag/severity rules read the intent — so the batch rebuild emits the
dict-miss default 'Unknown' (cannibalization.py:790) and keeps every
severity decision exact. At corpus scale the keyword→pages index is a
single hash aggregate on ``keyword`` (map-side partial counts per page
type), never a driver dict and never a self-join: 10^9 (url, keyword)
rows group in one shuffle.

Determinism contract (documented divergences, order-only):
- primary-page ties on (prominence, density) break on MIN url; the
  reference's stable sort keeps dict-insertion order, which is its
  fetch-completion order — not reproducible.
- ``page_types`` summary lists types in a fixed canonical order; the
  reference uses defaultdict insertion order.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame, functions as F

# cannibalization.py:206-259 — path/content indicator lists, verbatim.
_SYSTEM_PATHS = ["/privacy", "/terms", "/policy", "/thank-you",
                 "/contact", "/appointment", "/book"]
_PROFILE_PATHS = ["/doctor/", "/dr-", "/dentist/", "/team/", "/our-team/",
                  "/meet-", "/about-dr", "/specialist/", "/our-doctors/",
                  "/staff/", "/hygienist/", "/orthodontist/"]
_PROFILE_CONTENT = ["meet dr", "about dr", "dr. ", "biography",
                    "education", "credentials", "experience"]
_BLOG_PATHS = ["/blog/", "/news/", "/articles/", "/post/", "/insights/",
               "/tips/", "/guide/", "/how-to/", "/learn/", "/education/",
               "/faq/", "/questions/", "/learning-center/"]
_REVIEW_PATHS = ["/review", "/testimonial", "/case-stud",
                 "/patient-stor", "/success-stor"]
_LOCATION_PATHS = ["/location", "/directions", "/find-us",
                   "/office", "/address"]

# cannibalization.py:176-178 — residual stop-word set, verbatim.
_STOP_WORDS = ["the", "and", "or", "but", "in", "on", "at", "to", "for",
               "of", "with", "by", "from", "an", "as", "is", "was", "are"]

# fixed canonical order for the page_types summary (see module doc)
_TYPE_ORDER = ["Service", "Blog", "Profile", "Review", "Location",
               "System", "Homepage"]


def _any_contains(col: Column, needles: list[str]) -> Column:
    return reduce(or_, [col.contains(s) for s in needles])


def detect_page_type(url: Column, title: Column, h1: Column) -> Column:
    """cannibalization.py:184-264 — page-type heuristic as one when
    cascade (pure codegen). The reference's final service-indicator scan
    and its default both return 'Service', so the cascade folds them."""
    # urlparse(url).path — netloc stripped, query/fragment dropped
    path = F.lower(F.regexp_replace(
        F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", ""),
        r"[?#].*$", ""))
    t = F.lower(F.coalesce(title, F.lit("")))
    h = F.lower(F.coalesce(h1, F.lit("")))
    return (
        F.when(path.isin("/", "", "/index.html", "/home"), F.lit("Homepage"))
        .when(_any_contains(path, _SYSTEM_PATHS), F.lit("System"))
        .when(_any_contains(path, _PROFILE_PATHS), F.lit("Profile"))
        .when(_any_contains(t, _PROFILE_CONTENT)
              | _any_contains(h, _PROFILE_CONTENT), F.lit("Profile"))
        .when(_any_contains(path, _BLOG_PATHS), F.lit("Blog"))
        .when(path.rlike(r"/\d{4}/\d{2}/"), F.lit("Blog"))
        .when(_any_contains(path, _REVIEW_PATHS), F.lit("Review"))
        .when(_any_contains(path, _LOCATION_PATHS), F.lit("Location"))
        .otherwise(F.lit("Service"))
    )


def keyword_cannibalization(kw_rows: DataFrame,
                            branded_noise: list[str] | None = None) -> DataFrame:
    """Input: one row per (page, candidate keyword) —
    (url, title, h1, keyword, prominence_score, density).

    Pipeline (all JVM expressions, one shuffle):
      1. keyword gate  — 2-5 words, >=3 chars, not digits-only, not a
         stop word, not all-branded (cannibalization.py:300-331,150-181)
      2. primary gate  — in title or H1, and high density (>1.5) / high
         prominence (>50) / in both (cannibalization.py:266-297)
      3. groupBy(keyword) — per-type conditional counts + min_by primary
      4. severity cascade + risk score (cannibalization.py:604-688,
         786-812); only flagged severities survive
    """
    branded = [b.lower() for b in (branded_noise or [])]
    kw = F.lower(F.trim(F.col("keyword")))
    words = F.split(kw, r"\s+")
    wc = F.size(words)
    digits_only = F.regexp_replace(kw, r"[ .\-]", "").rlike(r"^[0-9]+$")
    noise = (F.length(kw) < 3) | digits_only | kw.isin(_STOP_WORDS)
    if branded:
        lit_branded = F.array(*[F.lit(b) for b in branded])
        noise = noise | kw.isin(branded) \
            | F.forall(words, lambda w: F.array_contains(lit_branded, w))
    t = F.lower(F.coalesce(F.col("title"), F.lit("")))
    h = F.lower(F.coalesce(F.col("h1"), F.lit("")))
    in_title, in_h1 = t.contains(kw), h.contains(kw)
    primary = (in_title | in_h1) & (
        (F.col("density") > 1.5) | (F.col("prominence_score") > 50)
        | (in_title & in_h1)
    )
    rows = (
        kw_rows
        .withColumn("kw", kw)
        .filter(wc.between(2, 5) & ~noise & primary)
        .withColumn("page_type",
                    detect_page_type(F.col("url"), F.col("title"), F.col("h1")))
    )

    n_of = {pt: F.sum((F.col("page_type") == pt).cast("int")).alias(f"n_{pt.lower()}")
            for pt in _TYPE_ORDER}
    g = (
        rows.groupBy(F.col("kw").alias("keyword"))
        .agg(
            F.count("*").alias("page_count"),
            *n_of.values(),
            # primary page = max (prominence, density); tie -> min url
            F.min_by(
                F.struct(F.col("url").alias("url"),
                         F.col("page_type").alias("ptype"),
                         F.col("prominence_score").alias("prom")),
                F.struct((-F.col("prominence_score")).alias("a"),
                         (-F.col("density")).alias("b"),
                         F.col("url").alias("c")),
            ).alias("primary"),
            F.sum((F.col("prominence_score") > 60).cast("int")).alias("n_hi"),
        )
        .filter(F.col("page_count") >= 2)
    )

    ns, nb = F.col("n_service"), F.col("n_blog")
    np_, nr, nh = F.col("n_profile"), F.col("n_review"), F.col("n_homepage")
    severity = (
        F.when(ns >= 2, F.lit("high"))                          # rule 1
        .when((ns >= 1) & (nb >= 1), F.lit("low"))              # rule 2
        .when((ns >= 1) & ((np_ >= 1) | (nr >= 1)), F.lit("none"))  # rule 3
        .when((nb >= 2) & (ns == 0), F.lit("medium"))           # rule 4
        .when((nh >= 1) & (ns >= 1), F.lit("none"))             # rule 5
        .when((ns == 0) & (nb == 0), F.lit("none"))             # rule 6
        .otherwise(F.lit("none"))
    )
    pc = F.col("page_count")
    risk = (
        F.when(F.col("severity") == "high", F.least(F.lit(90), F.lit(70) + pc * 5))
        .when(F.col("severity") == "medium", F.least(F.lit(70), F.lit(40) + pc * 5))
        .otherwise(F.least(F.lit(50), F.lit(20) + pc * 5))
    ).cast("long")
    type_summary = F.concat_ws(
        ", ",
        F.filter(
            F.array(*[
                F.when(F.col(f"n_{pt.lower()}") > 0,
                       F.concat(F.col(f"n_{pt.lower()}").cast("string"),
                                F.lit(" " + pt)))
                for pt in _TYPE_ORDER
            ]),
            lambda x: x.isNotNull(),
        ),
    )
    risk_factors = F.filter(
        F.array(
            F.when(pc >= 3, F.concat(pc.cast("string"), F.lit(" pages competing"))),
            F.when(F.col("severity") == "high",
                   F.lit("Critical Service vs Service conflict"))
            .when(F.col("severity") == "medium",
                  F.lit("Multiple Blog posts overlap")),
            F.when(F.col("n_hi") >= 2, F.lit("Multiple pages highly optimized")),
        ),
        lambda x: x.isNotNull(),
    )

    return (
        g.withColumn("severity", severity)
        .filter(F.col("severity") != "none")
        .select(
            "keyword",
            F.lit("Unknown").alias("search_intent"),
            "severity",
            risk.alias("risk_score"),
            F.col("page_count").cast("long").alias("page_count"),
            type_summary.alias("page_types"),
            F.col("primary.url").alias("primary_url"),
            F.col("primary.ptype").alias("primary_type"),
            F.round(F.col("primary.prom"), 2).alias("primary_prominence"),
            risk_factors.alias("risk_factors"),
        )
        .orderBy(F.desc("risk_score"), F.asc("keyword"))
    )
