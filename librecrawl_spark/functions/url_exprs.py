"""Native (JVM) column expressions for URL keys.

``canonical_key`` / ``canonical_hash`` implement the north-star
canonicalization (lowercase host, strip fragment + tracking params, sort
query keys -> xxhash64) entirely with builtin functions so the seen-set
key derivation runs inside whole-stage codegen, no Python.

Semantics note: the Python twin (functions/urls.canonicalize) percent-
decodes and re-encodes query pairs; this native form sorts the raw
``k=v`` byte strings. The two agree on URLs without exotic percent-
encoding (tests assert agreement on the fixture universe). The exact
seen-set membership contract stays the reference's raw-string equality
(link_manager.py:83-85) — the canonical hash is the engine's *bucketing
and bloom key*, not the dedup truth.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from librecrawl_spark.functions.urls import TRACKING_PARAMS


def canonical_key(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when((scheme == "http") & host.endswith(":80"),
               F.regexp_replace(host, ":80$", ""))
        .when((scheme == "https") & host.endswith(":443"),
              F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    tracking = F.array(*[F.lit(t) for t in sorted(TRACKING_PARAMS)])
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.array_contains(
            tracking, F.lower(F.element_at(F.split(p, "=", 2), 1))
        ),
    )
    sorted_q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def canonical_hash(url: Column) -> Column:
    """xxhash64 of the canonical key — the seen-set bucketing/bloom key
    (north_star: 'bloom/cuckoo-filter URL-seen set keyed on canonicalized
    URL hashes')."""
    return F.xxhash64(canonical_key(url))
