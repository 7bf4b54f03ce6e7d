"""Issue detection — the engine analogue of
/root/reference/src/core/issue_detector.py (1981 LoC).

Per-page checks compile to ONE select of `when`-expressions building an
array of issue structs, then a single explode — the whole per-page pass
is JVM-side whole-stage codegen, no Python. Whole-crawl checks (J3-J7)
are separate DataFrame jobs.

Issue row shape matches the reference (issue_detector.py:116-121):
(url, type in {error,warning,info}, category, issue, details).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# --- page-type classifier (issue_detector.py:933-1034, C11) ----------------

_ARCHIVE_SUBSTRINGS = (
    "/author/", "/tag/", "/category/", "/tags/", "/categories/", "/page/",
    "/feed/", "/search/", "/?s=", "/attachment/", "/archive/", "/archives/",
)
_IMPORTANT_SUBSTRINGS = (
    "/service", "/location", "-dentist", "/contact", "/about",
)
_UTILITY_SUBSTRINGS = (
    # issue_detector.py:99-107 (title check's utility overlay)
    "/thank-you", "/thankyou", "/confirmation", "/privacy-policy", "/privacy",
    "/terms", "/legal", "/cookie-policy", "/gdpr", "/dmca", "/login",
    "/register", "/signup", "/account", "/cart", "/checkout", "/wishlist",
    "/search", "/404", "/error",
)
_SOFT404_PHRASES = (
    # issue_detector.py:439-444
    "not found", "404", "page not found", "error 404", "page doesn't exist",
    "page does not exist", "no longer available", "has been removed",
    "could not be found", "cannot be found", "doesn't exist",
    "does not exist", "oops", "sorry", "nothing here",
)


def _path_of(url: Column) -> Column:
    return F.lower(F.regexp_replace(F.regexp_replace(url, r"^https?://[^/]*", ""), r"[?#].*$", ""))


def _contains_any(col: Column, needles: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def classify_page_type(url: Column) -> Column:
    """'archive' | 'important' | 'other' — native transcription of
    issue_detector.py:933-1034."""
    path = _path_of(url)
    is_archive = (
        _contains_any(path, _ARCHIVE_SUBSTRINGS)
        | _contains_any(url, _ARCHIVE_SUBSTRINGS)
        | path.rlike(r"/\d{4}/(\d{2}/)?(\d{2}/)?$")
        | url.contains("page=")
        | url.contains("paged=")
    )
    is_important = (
        (path == "/") | (path == "")
        | _contains_any(path, _IMPORTANT_SUBSTRINGS)
        | path.rlike(r"/\d{4}/\d{2}/\d{2}/[a-z0-9-]+")
        # single >3-char slug => important (issue_detector.py:1026-1029)
        | path.rlike(r"^/[^/]{4,}/?$")
    )
    return (
        F.when(is_archive, F.lit("archive"))
        .when(is_important, F.lit("important"))
        .otherwise(F.lit("other"))
    )


def is_archive_or_utility(url: Column) -> Column:
    return (classify_page_type(url) == "archive") | _contains_any(
        _path_of(url), _UTILITY_SUBSTRINGS
    )


def _norm_cmp(col: Column) -> Column:
    """normalize_for_compare (issue_detector.py:61-86) as native exprs."""
    u = F.lower(F.trim(col))
    u = F.regexp_replace(u, r"#.*$", "")
    # strip trailing slash except root (scheme://host/)
    u = F.when(u.rlike(r"^https?://[^/]+/$"), u).otherwise(F.regexp_replace(u, r"/$", ""))
    return u


# --- per-page checks ---------------------------------------------------------

_ISSUE_T = "struct<type:string, category:string, issue:string, details:string>"


def _mk(cond: Column, typ, category: str, issue, details) -> Column:
    typ = F.lit(typ) if isinstance(typ, str) else typ
    issue = F.lit(issue) if isinstance(issue, str) else issue
    details = F.lit(details) if isinstance(details, str) else details
    return F.when(
        cond,
        F.struct(typ.alias("type"), F.lit(category).alias("category"),
                 issue.alias("issue"), details.alias("details")),
    )


def per_page_issues(pages: DataFrame) -> DataFrame:
    """All per-page checks in one JVM pass. Citations inline; severity
    downgrade rules (archive/utility) transcribed from the reference."""
    url = F.col("url")
    title = F.col("title")
    desc = F.col("meta_description")
    h1 = F.col("h1")
    status = F.col("status_code")
    wc = F.col("word_count")
    arch = is_archive_or_utility(url)
    ptype = classify_page_type(url)
    robots = F.lower(F.coalesce(F.col("robots"), F.lit("")))
    xrobots = (
        F.lower(F.coalesce(F.col("x_robots_tag"), F.lit("")))
        if "x_robots_tag" in pages.columns else F.lit("")
    )
    # issue_detector.py:879-881 — meta tag OR X-Robots-Tag header
    noindex = robots.contains("noindex") | xrobots.contains("noindex")
    nofollow = robots.contains("nofollow") | xrobots.contains("nofollow")
    tlen = F.length(title)
    dlen = F.length(desc)
    parsed_html = F.col("content_type").contains("text/html") & F.col("error").isNull()

    checks = [
        # connectivity (issue_detector.py:30-38)
        _mk(status == 0, "error", "Connectivity", "Connection Error",
            F.coalesce(F.col("error"), F.lit("Failed to connect to server or request blocked"))),
        # titles (issue_detector.py:88-151)
        _mk(parsed_html & (tlen == 0),
            F.when(arch, "warning").otherwise("error"), "SEO",
            F.when(arch, "Missing Title Tag (Archive/Utility)").otherwise("Missing Title Tag"),
            "Page has no title tag"),
        _mk(tlen > 60, "warning", "SEO", "Page Titles: Over 60 Characters",
            F.concat(F.lit("Title is "), tlen.cast("string"), F.lit(" characters"))),
        _mk(tlen * 9 > 561, "warning", "SEO", "Page Titles: Over 561 Pixels",
            F.concat(F.lit("Title is approx "), (tlen * 9).cast("string"), F.lit(" pixels"))),
        _mk((tlen > 0) & (tlen < 30), "warning", "SEO", "Title Too Short",
            F.concat(F.lit("Title is "), tlen.cast("string"),
                     F.lit(" characters (recommended: 30-60)"))),
        # meta description (issue_detector.py:153-207)
        _mk(parsed_html & (dlen == 0),
            F.when(ptype == "archive", "info").otherwise("warning"), "SEO",
            F.when(ptype == "archive", "Meta Description: Missing (Archive/Utility)")
            .otherwise("Meta Description: Missing"),
            "Page has no meta description"),
        _mk(dlen > 155, "warning", "SEO", "Meta Description: Over 155 Characters",
            F.concat(F.lit("Description is "), dlen.cast("string"), F.lit(" characters"))),
        _mk(dlen * 9 > 985, "warning", "SEO", "Meta Description: Over 985 Pixels",
            F.concat(F.lit("Description is approx "), (dlen * 9).cast("string"), F.lit(" pixels"))),
        # headings (issue_detector.py:209-280)
        _mk(parsed_html & (F.size("h1_list") == 0),
            F.when(arch, "warning").otherwise("error"), "SEO",
            F.when(arch, "Missing H1 Tag (Archive/Utility)").otherwise("Missing H1 Tag"),
            "Page has no H1 heading"),
        _mk(F.size("h1_list") > 1, "warning", "SEO", "H1: Multiple",
            F.concat(F.lit("Page has "), F.size("h1_list").cast("string"), F.lit(" H1 tags"))),
        _mk(F.size(F.array_distinct("h1_list")) < F.size("h1_list"),
            "warning", "SEO", "H1: Duplicate", "Page has duplicate H1 tags"),
        _mk(F.length(h1) > 70, "warning", "SEO", "H1: Over 70 Characters",
            F.concat(F.lit("H1 is "), F.length(h1).cast("string"), F.lit(" characters"))),
        # duplicate H2 within page (issue_detector.py:310-351, A6)
        _mk(F.size(F.array_distinct("h2")) < F.size("h2"),
            F.when(arch, "info").otherwise("warning"), "SEO",
            F.when(arch, "H2: Duplicate (Archive/Utility)").otherwise("H2: Duplicate"),
            "Page has duplicate H2 tags"),
        # content (issue_detector.py:353-366)
        _mk(parsed_html & (status == 200) & (wc < 300), "warning", "Content", "Thin Content",
            F.concat(F.lit("Page has only "), wc.cast("string"),
                     F.lit(" words (recommended: ≥300)"))),
        # status codes (issue_detector.py:367-399, C8)
        _mk((status >= 400) & (status < 500), "error", "Technical",
            "Response Codes: External Client Error (4xx)",
            F.concat(F.lit("HTTP "), status.cast("string"))),
        _mk(status >= 500, "error", "Technical",
            "Response Codes: External Server Error (5xx)",
            F.concat(F.lit("HTTP "), status.cast("string"))),
        _mk((status >= 300) & (status < 400), "info", "Technical",
            "Response Codes: Internal Redirection (3xx)",
            "URL redirects to another location"),
        # soft 404 (issue_detector.py:405-451, C10)
        _mk(
            (status == 200)
            & (_contains_any(F.lower(title), _SOFT404_PHRASES)
               | _contains_any(F.lower(h1), _SOFT404_PHRASES)),
            F.when(_contains_any(F.lower(title), _SOFT404_PHRASES)
                   & _contains_any(F.lower(h1), _SOFT404_PHRASES), "error")
            .otherwise("warning"),
            "Technical", "Soft 404: Returns 200 but appears broken",
            F.concat(F.lit('Title "'), F.substring(title, 1, 60),
                     F.lit('" or H1 suggests this is an error page'))),
        # redirect chains (issue_detector.py:453-505, C13)
        _mk(
            F.size(F.col("redirect_chain"))
            > F.size(F.array_distinct(F.expr(
                "transform(redirect_chain, c -> c.url)"))),
            "error", "Technical", "Redirect Loop Detected",
            "URL redirects back to itself"),
        _mk(F.col("redirect_count") > 3, "warning", "Technical", "Long Redirect Chain",
            F.concat(F.col("redirect_count").cast("string"),
                     F.lit(" redirects before final destination"))),
        _mk((F.col("redirect_count") > 1) & (F.col("redirect_count") <= 3),
            "info", "Technical", "Redirect Chain",
            F.concat(F.col("redirect_count").cast("string"), F.lit(" redirects"))),
        # canonical (issue_detector.py:505-595)
        _mk(parsed_html & (F.length("canonical_url") == 0) & ~noindex & (status == 200),
            F.when(ptype == "archive", "warning").otherwise("error"),
            "Technical", "Missing Canonical URL",
            F.when(ptype == "important", F.lit("Indexable content page has no canonical URL"))
            .when(ptype == "archive",
                  F.lit("Archive page missing canonical (Review if this should be indexed)"))
            .otherwise(F.lit("Page has no canonical URL specified"))),
        _mk(
            (F.length("canonical_url") > 0)
            & (_norm_cmp(F.col("canonical_url")) != _norm_cmp(url)),
            F.when(
                F.col("canonical_url").rlike(r"^https?://[^/]+/?$") & ~url.rlike(r"^https?://[^/]+/?$"),
                "error",
            ).otherwise("warning"),
            "Technical", "Canonicals: Canonicalised",
            F.concat(F.lit("Page is canonicalised to: "), F.col("canonical_url"))),
        # mobile (issue_detector.py:597-608)
        _mk(parsed_html & (status == 200) & (F.length("viewport") == 0),
            "error", "Mobile", "Missing Viewport Meta Tag",
            "Page is not mobile-optimized (no viewport meta tag)"),
        # accessibility: images missing alt (issue_detector.py:610-651, A4)
        _mk(
            F.size(F.expr("filter(images, i -> i.alt = '')")) > 0,
            "warning", "Accessibility", "Images Missing Alt Text",
            F.concat(F.size(F.expr("filter(images, i -> i.alt = '')")).cast("string"),
                     F.lit(" images without alt text"))),
        # indexability (issue_detector.py:873-931)
        _mk(noindex,
            F.when(ptype == "archive", "info")
            .when(ptype == "important", "error").otherwise("warning"),
            "Indexability", "Directives: Noindex",
            F.when(ptype == "archive", F.lit("Source: HTML Meta Tag (Expected for archive page)"))
            .when(ptype == "important",
                  F.lit("Source: HTML Meta Tag (Critical: Important page is blocked!)"))
            .otherwise(F.lit("Source: HTML Meta Tag"))),
        _mk(nofollow, "warning", "Indexability", "Directives: Nofollow",
            "Source: HTML Meta Tag"),
    ]
    # reference gate: a status-0 result early-returns after the
    # connection-failure row (issue_detector.py:29-40), so every family
    # below only fires on live responses
    live = status != 0

    # social (issue_detector.py:653-674)
    og = F.coalesce(F.col("og_tags"), F.expr("map()"))
    tw = F.coalesce(F.col("twitter_tags"), F.expr("map()"))
    checks += [
        _mk(live & (F.size(og) == 0), "info", "Social", "Missing OpenGraph Tags",
            "Page has no OpenGraph tags for social sharing"),
        _mk(live & (F.size(tw) == 0), "info", "Social", "Missing Twitter Card Tags",
            "Page has no Twitter Card tags"),
    ]

    # URL structure (issue_detector.py:1037-1079) — path is the raw
    # (case-preserving) urlparse().path: scheme://host stripped, ?# cut
    raw_path = F.regexp_replace(F.regexp_replace(url, r"^https?://[^/?#]*", ""), r"[?#].*$", "")
    path_parts = F.expr(
        "filter(split(regexp_replace(regexp_replace(url, '^https?://[^/?#]*', ''),"
        " '[?#].*$', ''), '/'), x -> x != '')"
    )
    checks += [
        _mk(live & (F.length(url) > 115), "info", "URL", "URL: Over 115 Characters",
            F.concat(F.lit("URL is "), F.length(url).cast("string"),
                     F.lit(" characters long"))),
        _mk(live & raw_path.contains("_"), "info", "URL", "URL: Underscores",
            "URL contains underscores (use hyphens instead)"),
        _mk(live & url.contains("?"), "info", "URL", "URL: Parameters",
            "URL contains query parameters"),
        _mk(live & (F.size(path_parts) != F.size(F.array_distinct(path_parts))),
            "info", "URL", "URL: Repetitive Path",
            "URL path contains duplicate segments"),
    ]

    # performance (issue_detector.py:849-871)
    rt = (F.coalesce(F.col("response_time"), F.lit(0.0))
          if "response_time" in pages.columns else F.lit(0.0))
    psize = F.coalesce(F.col("size"), F.lit(0))
    checks += [
        _mk(live & (rt > 3000), "error", "Performance", "Slow Response Time",
            F.concat(F.lit("Page took "), rt.cast("string"),
                     F.lit("ms to respond (recommended: <3000ms)"))),
        _mk(live & (psize > 3 * 1024 * 1024), "error", "Performance", "Large Page Size",
            F.concat(F.lit("Page size is "),
                     F.format_string("%.1f", psize / F.lit(1024.0) / F.lit(1024.0)),
                     F.lit("MB (recommended: <3MB)"))),
    ]

    # links (issue_detector.py:1081-1151) — per-page aggregations over the
    # links_data array via higher-order filters: no explode, no shuffle
    if "links_data" in pages.columns:
        ld = F.coalesce(
            F.col("links_data"),
            F.expr("cast(array() as array<struct<href:string, absolute_url:string,"
                   " text:string, rel:array<string>, target:string,"
                   " is_internal:boolean>>)"),
        )
        ext_out = F.coalesce(F.col("external_links"), F.lit(0))
        n_nofollow = F.size(F.filter(
            ld, lambda l: l["is_internal"] & F.array_contains(l["rel"], "nofollow")))
        n_empty = F.size(F.filter(ld, lambda l: l["text"] == ""))
        generic = F.array(*[F.lit(g) for g in
                            ("click here", "read more", "more", "here",
                             "link", "this", "go")])
        n_generic = F.size(F.filter(
            ld,
            lambda l: l["is_internal"]
            & F.array_contains(generic, F.lower(F.trim(l["text"]))),
        ))
        checks += [
            _mk(live & (ext_out > 50), "info", "Links",
                "Links: Pages With High External Outlinks",
                F.concat(F.lit("Page has "), ext_out.cast("string"),
                         F.lit(" external links"))),
            _mk(live & (n_nofollow > 0), "info", "Links",
                "Links: Internal Nofollow Outlinks",
                F.concat(n_nofollow.cast("string"),
                         F.lit(" internal links are marked nofollow"))),
            # reference counts ALL empty-text links despite the
            # "Internal" in the issue name (issue_detector.py:1112-1118);
            # the stored links_data has no aria-label key, so that branch
            # of the guard is vacuously true
            _mk(live & (n_empty > 0), "warning", "Links",
                "Links: Internal Outlinks With No Anchor Text",
                F.concat(n_empty.cast("string"), F.lit(" links have no anchor text"))),
            _mk(live & (n_generic > 0), "warning", "Links",
                "Links: Non-Descriptive Anchor Text",
                F.concat(n_generic.cast("string"),
                         F.lit(' links use generic text like "click here"'))),
        ]

        # security, per-page part (issue_detector.py:1250-1298): mixed
        # content + protocol-relative resources on https pages. (Images'
        # protocol-relative srcs are absolutized at extraction, so only
        # links_data hrefs can trip the second check — same dead branch
        # as the reference.)
        imgs = F.coalesce(F.col("images"), F.expr(
            "cast(array() as array<struct<src:string, alt:string,"
            " width:string, height:string>>)"))
        mixed = F.transform(
            F.filter(imgs, lambda i: i["src"].startswith("http://")),
            lambda i: F.concat(F.lit("Image: "), i["src"]),
        )
        n_mixed = F.size(mixed)
        mixed_details = F.concat(
            F.lit("Secure page loads insecure (HTTP) assets: "),
            F.array_join(F.slice(mixed, 1, 5), ", "),
            F.when(n_mixed > 5,
                   F.concat(F.lit(", and "), (n_mixed - 5).cast("string"),
                            F.lit(" more"))).otherwise(F.lit("")),
        )
        n_proto_rel = (
            F.size(F.filter(imgs, lambda i: i["src"].startswith("//")))
            + F.size(F.filter(ld, lambda l: l["href"].startswith("//")))
        )
        is_https = url.startswith("https://")
        checks += [
            _mk(live & is_https & (n_mixed > 0), "error", "Security",
                "Security: Mixed Content", mixed_details),
            _mk(live & is_https & (n_proto_rel > 0), "warning", "Security",
                "Security: Protocol-Relative Resource Links",
                F.concat(n_proto_rel.cast("string"),
                         F.lit(" resources use protocol-relative URLs (//)."
                               " Use explicit HTTPS instead."))),
        ]
    # structured data (issue_detector.py:675-852) — the schema analysis
    # (recursive @type walk, FAQ count, org/website flags) runs once in
    # the extraction pass; here the checks stay pure column expressions.
    if "schema_types" in pages.columns:
        no_data = (F.size("json_ld") == 0) & (F.size("schema_org") == 0)
        types_has = lambda t: F.array_contains("schema_types", t)
        checks += [
            # reference early-returns after this check, so every other
            # structured check is conditioned on NOT no_data
            _mk(no_data, "warning", "Structured Data", "No Structured Data",
                "Page has no JSON-LD or Schema.org markup"),
            _mk(
                ~no_data & (ptype == "important")
                & ~F.col("has_organization") & ~F.col("has_website")
                & ~types_has("Article") & ~types_has("BlogPosting") & ~types_has("Product"),
                "info", "Structured Data", "Schema: Missing Organization/WebSite",
                "Consider adding Organization or WebSite schema for brand visibility"),
            _mk(~no_data & types_has("FAQPage") & (F.col("faq_count") == 0),
                "warning", "Structured Data", "Schema: FAQPage has no questions",
                "FAQPage schema found but no Question items detected"),
            _mk(~no_data & types_has("FAQPage")
                & (F.col("faq_count") > 0) & (F.col("faq_count") < 3),
                "info", "Structured Data", "Schema: FAQPage has few questions",
                F.concat(F.lit("Only "), F.col("faq_count").cast("string"),
                         F.lit(" FAQ items found (3+ recommended)"))),
            _mk(
                ~no_data
                & (types_has("Article") | types_has("BlogPosting") | types_has("NewsArticle"))
                & ~F.col("article_fields_ok"),
                "warning", "Structured Data", "Schema: Article missing required fields",
                "Article schema should have headline and datePublished"),
        ]
    arr = F.array_compact(F.array(*[c.otherwise(F.lit(None).cast(_ISSUE_T)) for c in checks]))
    return (
        pages.select(url.alias("url"), F.explode(arr).alias("i"))
        .select("url", "i.*")
    )


def security_header_issues(pages: DataFrame) -> DataFrame:
    """Site-wide security-header checks (issue_detector.py:1186-1247):
    Missing CSP / HSTS / X-Frame-Options, reported ONCE per domain (the
    reference's reported_sitewide_issues set), attributed to the domain's
    first crawled page in fetch order and emitted as scheme://domain.

    Scale shape: one groupBy(domain) with min_by — no window, no
    all-pages shuffle beyond the single keyed aggregation."""
    hm = F.coalesce(F.col("response_headers"), F.expr("map()"))
    live = F.col("status_code") != 0
    domain = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    scheme = F.regexp_extract("url", r"^(https?)://", 1)
    base = (
        pages.filter(live)
        .select(
            "url", "wave", "seq", domain.alias("domain"), scheme.alias("scheme"),
            (~F.map_contains_key(hm, "content-security-policy")).alias("miss_csp"),
            (F.col("url").startswith("https://")
             & ~F.map_contains_key(hm, "strict-transport-security")).alias("miss_hsts"),
            (~F.map_contains_key(hm, "x-frame-options")).alias("miss_xfo"),
        )
    )
    rows = []
    for flag, typ, issue, details in (
        ("miss_csp", "info", "Security: Missing Content-Security-Policy",
         "Server does not send Content-Security-Policy header. "
         "This is a site-wide configuration issue."),
        ("miss_hsts", "warning", "Security: Missing HSTS Header",
         "HTTP Strict Transport Security (HSTS) is not enabled. "
         "Users effectively can be downgraded to HTTP."),
        ("miss_xfo", "info", "Security: Missing X-Frame-Options",
         "Missing X-Frame-Options header can leave the site vulnerable "
         "to Clickjacking."),
    ):
        rows.append(
            base.filter(F.col(flag))
            .groupBy("domain")
            .agg(F.min_by("scheme", F.struct("wave", "seq")).alias("scheme"))
            .select(
                F.concat("scheme", F.lit("://"), "domain").alias("url"),
                F.lit(typ).alias("type"),
                F.lit("Security").alias("category"),
                F.lit(issue).alias("issue"),
                F.lit(details).alias("details"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def unsafe_cross_origin_issues(pages: DataFrame) -> DataFrame:
    """Links: Unsafe Cross-Origin (issue_detector.py:1153-1184): external
    links opening in _blank without rel=noopener/noreferrer, reported
    once per EXTERNAL domain site-wide, attributed to the first page (in
    fetch order) where the domain was seen. Domain parses from the RAW
    href like the reference's urlparse(href).netloc — relative hrefs
    yield '' and are skipped."""
    ld = F.coalesce(
        F.col("links_data"),
        F.expr("cast(array() as array<struct<href:string, absolute_url:string,"
               " text:string, rel:array<string>, target:string,"
               " is_internal:boolean>>)"),
    )
    unsafe = F.filter(
        ld,
        lambda l: (l["target"] == "_blank") & ~l["is_internal"]
        & ~F.array_contains(l["rel"], "noopener")
        & ~F.array_contains(l["rel"], "noreferrer"),
    )
    dom = F.regexp_extract(F.col("l")["href"], r"^(?:https?:)?//([^/]*)", 1)
    return (
        pages.filter(F.col("status_code") != 0)
        .select("url", "wave", "seq", F.explode(unsafe).alias("l"))
        .select("url", "wave", "seq", dom.alias("domain"))
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(F.min_by("url", F.struct("wave", "seq")).alias("url"))
        .select(
            "url",
            F.lit("info").alias("type"),
            F.lit("Security").alias("category"),
            F.lit("Security: Unsafe Cross-Origin Links").alias("issue"),
            F.concat(
                F.lit("External domain "), F.col("domain"),
                F.lit(' opens in new tab without rel="noopener" '
                      "(Best practice recommendation)"),
            ).alias("details"),
        )
    )


def detect_all_issues(pages: DataFrame, links: DataFrame, *,
                      duplication_threshold: float = 0.85,
                      enable_duplication_check: bool = True,
                      exclusion_patterns: tuple[str, ...] = ()) -> DataFrame:
    """The full issue report — engine analogue of running the
    reference's ``detect_issues`` over every crawled result plus its
    whole-crawl passes (issue_detector.py:19-56, 1299-1969): per-page
    checks, link-graph joins (J4/J5), hreflang (J6), site-wide security,
    duplicate content (J7), with issue-exclusion patterns applied last.
    Returns (url, type, category, issue, details). Sitemap cross-ref
    (J3) stays separate — it yields classifications, not issue rows."""
    core = ["url", "type", "category", "issue", "details"]
    parts = [
        per_page_issues(pages).select(*core),
        links_to_redirects(pages, links).select(*core),
        broken_link_sources(pages, links).select(*core),
        hreflang_invalid_codes(pages).select(*core),
        hreflang_reciprocity(pages).select(*core),
    ]
    if "response_headers" in pages.columns:
        parts.append(security_header_issues(pages).select(*core))
    if "links_data" in pages.columns:
        parts.append(unsafe_cross_origin_issues(pages).select(*core))
    if enable_duplication_check:
        parts.append(duplicate_content_issues(pages, duplication_threshold).select(*core))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    if exclusion_patterns:
        out = apply_issue_exclusions(out, tuple(exclusion_patterns))
    return out


def apply_issue_exclusions(issues: DataFrame, patterns: tuple[str, ...]) -> DataFrame:
    """F11 (issue_detector.py:1457-1469 + re-applied at read
    main.py:409-441): drop issues whose URL *path* matches an exclusion
    pattern — fnmatch when the pattern has a '*', else exact-or-prefix.
    Exact fnmatch semantics via a tiny Arrow UDF (the issues table is
    small relative to pages; patterns are user-supplied globs)."""
    if not patterns:
        return issues
    pats = tuple(patterns)

    @F.pandas_udf("boolean")
    def excluded(url_s):
        from fnmatch import fnmatch
        from urllib.parse import urlparse

        import pandas as pd

        out = []
        for u in url_s:
            path = urlparse(u or "").path
            hit = False
            for p in pats:
                if "*" in p:
                    if fnmatch(path, p):
                        hit = True
                        break
                elif path == p or path.startswith(p.rstrip("*")):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out, dtype=bool)

    return issues.filter(~excluded(F.col("url")))


# --- whole-crawl checks ------------------------------------------------------

def links_to_redirects(pages: DataFrame, links: DataFrame) -> DataFrame:
    """J4 (issue_detector.py:1628-1718): internal links whose target is a
    3xx page, grouped by source page."""
    redirecting = pages.filter(
        (F.col("status_code") >= 300) & (F.col("status_code") < 400)
    ).select(_norm_cmp(F.col("url")).alias("_t"), F.col("url").alias("redirect_url"))
    j = (
        links.filter("is_internal")
        .withColumn("_t", _norm_cmp(F.col("target_url")))
        .join(redirecting, "_t")
    )
    return (
        j.groupBy("source_url")
        .agg(
            F.count("*").alias("n_links_to_redirects"),
            F.sort_array(F.collect_set("redirect_url")).alias("redirect_targets"),
        )
        .select(
            F.col("source_url").alias("url"), F.lit("warning").alias("type"),
            F.lit("Links").alias("category"),
            F.lit("Internal Links to Redirects").alias("issue"),
            F.concat(F.col("n_links_to_redirects").cast("string"),
                     F.lit(" internal links point to redirecting URLs")).alias("details"),
            "n_links_to_redirects", "redirect_targets",
        )
    )


def broken_link_sources(pages: DataFrame, links: DataFrame) -> DataFrame:
    """J5 (issue_detector.py:1720-1815): pages with status>=400 or 0
    joined back to their linking sources."""
    broken = pages.filter(
        (F.col("status_code") >= 400) | (F.col("status_code") == 0)
    ).select(F.col("url").alias("target_url"), "status_code")
    return (
        links.join(broken, "target_url")
        .groupBy("target_url", "status_code")
        .agg(F.sort_array(F.collect_set("source_url")).alias("linked_from"))
        .select(
            F.col("target_url").alias("url"), F.lit("error").alias("type"),
            F.lit("Links").alias("category"), F.lit("Broken Link Target").alias("issue"),
            F.concat(F.lit("HTTP "), F.col("status_code").cast("string"),
                     F.lit(" linked from "), F.size("linked_from").cast("string"),
                     F.lit(" pages")).alias("details"),
            "linked_from",
        )
    )


_VALID_LANG_CODES = (
    # issue_detector.py:1830-1839 — ISO 639-1 set + x-default
    "aa ab af ak am ar as ay az ba be bg bh bi bn bo br bs ca co cs cy da de dz "
    "el en eo es et eu fa fi fj fo fr fy ga gd gl gn gu ha he hi hr hu hy ia id "
    "ie ik is it iu ja jv ka kk kl km kn ko ks ku ky la lb ln lo lt lv mg mi mk "
    "ml mn mr ms mt my na ne nl no oc om or pa pl ps pt qu rm rn ro ru rw sa sd "
    "sg sh si sk sl sm sn so sq sr ss st su sv sw ta te tg th ti tk tl tn to tr "
    "ts tt tw ug uk ur uz ve vi vo wo xh yi yo za zh zu x-default"
).split()
_HREFLANG_RE = r"(?i)^[a-z]{2,3}(-[A-Za-z]{2,4})?(-[A-Za-z]{2})?$|^x-default$"


def hreflang_invalid_codes(pages: DataFrame) -> DataFrame:
    """C12 (issue_detector.py:1830-1843, 1885-1902): hreflang codes must
    match the lang[-region[-script]] pattern AND have a known primary
    subtag. Native rlike + isin over exploded edges."""
    edges = (
        pages.select(F.col("url"), F.explode("hreflang").alias("h"))
        .select("url", F.col("h.lang").alias("lang"), F.col("h.url").alias("target"))
    )
    primary = F.lower(F.element_at(F.split(F.col("lang"), "-"), 1))
    bad = (
        ~F.col("lang").rlike(_HREFLANG_RE)
        | (~primary.isin(*_VALID_LANG_CODES) & (F.lower(F.col("lang")) != "x-default"))
    )
    return edges.filter(bad).select(
        "url", F.lit("warning").alias("type"), F.lit("International").alias("category"),
        F.lit("Hreflang: Invalid Language Code").alias("issue"),
        F.concat(F.lit("Invalid hreflang code: "), F.col("lang")).alias("details"),
        "lang", "target",
    )


def hreflang_reciprocity(pages: DataFrame) -> DataFrame:
    """J6 (issue_detector.py:1817-1969): explode per-page hreflang edges;
    (A -> B) without a matching (B -> A) is non-reciprocal."""
    edges = (
        pages.select(F.col("url").alias("source"), F.explode("hreflang").alias("h"))
        .select("source", F.col("h.lang").alias("lang"), F.col("h.url").alias("target"))
        .filter(F.col("target") != F.col("source"))
    )
    back = edges.select(
        F.col("source").alias("b_source"), F.col("target").alias("b_target")
    ).distinct()
    j = edges.join(
        back,
        (edges["target"] == back["b_source"]) & (edges["source"] == back["b_target"]),
        "left",
    )
    return j.filter(F.col("b_source").isNull()).select(
        F.col("source").alias("url"), F.lit("warning").alias("type"),
        F.lit("International").alias("category"),
        F.lit("Hreflang: Missing Return Link").alias("issue"),
        F.concat(F.lit("hreflang to "), F.col("target"),
                 F.lit(" has no return link")).alias("details"),
        F.col("target").alias("hreflang_target"), "lang",
    )


def sitemap_cross_ref(sitemap_urls: DataFrame, pages: DataFrame) -> DataFrame:
    """J3 'dirty sitemap' (issue_detector.py:1492-1626): left-join sitemap
    URLs to crawl results on normalized URL; classify."""
    sm = sitemap_urls.select(
        F.col("url").alias("sitemap_url"), _norm_cmp(F.col("url")).alias("_k")
    ).distinct()
    pg = pages.select(
        _norm_cmp(F.col("url")).alias("_k"), "status_code",
        F.lower(F.coalesce("robots", F.lit(""))).alias("_robots"),
        F.col("canonical_url"), F.col("url").alias("crawled_url"),
    )
    j = sm.join(pg, "_k", "left")
    cls = (
        F.when(F.col("crawled_url").isNull(), "not_crawled")
        .when(F.col("status_code") >= 400, "error")
        .when((F.col("status_code") >= 300) & (F.col("status_code") < 400), "redirect")
        .when(F.col("_robots").contains("noindex"), "noindex")
        .when(
            (F.length("canonical_url") > 0)
            & (_norm_cmp(F.col("canonical_url")) != F.col("_k")), "non_canonical")
        .otherwise("valid")
    )
    return j.select("sitemap_url", cls.alias("classification"), "status_code")


def sitemap_health(sitemap_urls: DataFrame, pages: DataFrame) -> DataFrame:
    """A7: conditional tallies over the J3 classification."""
    c = sitemap_cross_ref(sitemap_urls, pages)
    return c.agg(
        F.count("*").alias("total"),
        *[
            F.sum(F.when(F.col("classification") == k, 1).otherwise(0)).alias(k)
            for k in ("valid", "error", "redirect", "noindex", "non_canonical", "not_crawled")
        ],
    )


# --- J7: duplicate-content detection (blocked, provably lossless) ----------

DUP_WEIGHTS = {"title": 0.35, "desc": 0.35, "h1": 0.20, "word_count": 0.10}


def dup_candidate_pairs(pages: DataFrame, threshold: float = 0.85) -> DataFrame:
    """The lossless blocking stage of J7 on its own: title-length-band
    candidate pairs (see duplicate_content_pairs for the bound proof).
    Split out so the candidate set itself is oracle-checkable in SQL
    (the difflib verify stage is not SQL-expressible)."""
    need = (threshold - (1.0 - DUP_WEIGHTS["title"])) / DUP_WEIGHTS["title"]
    if need <= 0:
        raise ValueError("threshold too low for lossless title blocking; use <=0.65 path")
    ratio_bound = need / (2.0 - need)  # min/max title length
    base = 1.0 / ratio_bound

    d = pages.select(
        "url",
        F.lower(F.trim(F.coalesce("title", F.lit("")))).alias("t"),
        F.lower(F.trim(F.coalesce("meta_description", F.lit("")))).alias("d"),
        F.lower(F.trim(F.coalesce("h1", F.lit("")))).alias("h"),
        F.coalesce("word_count", F.lit(0)).alias("wc"),
    ).filter((F.length("t") > 0) & (F.length("d") > 0))

    band = F.floor(F.log(float(base), F.greatest(F.length("t"), F.lit(1)).cast("double"))).cast("int")
    d = d.withColumn("band", band)
    # a valid pair's title-length bands differ by at most 1, but the
    # url_a<url_b pair order is independent of length order — probe both
    # neighbours (duplicates removed below)
    left = d.withColumn(
        "probe", F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1))
    )
    right = d.withColumnRenamed("band", "probe")
    return left.alias("a").join(
        right.alias("b"),
        (F.col("a.probe") == F.col("b.probe")) & (F.col("a.url") < F.col("b.url")),
    ).select(
        F.col("a.url").alias("url_a"), F.col("a.t").alias("t_a"),
        F.col("a.d").alias("d_a"), F.col("a.h").alias("h_a"), F.col("a.wc").alias("wc_a"),
        F.col("b.url").alias("url_b"), F.col("b.t").alias("t_b"),
        F.col("b.d").alias("d_b"), F.col("b.h").alias("h_b"), F.col("b.wc").alias("wc_b"),
    ).dropDuplicates(["url_a", "url_b"])


def duplicate_content_pairs(pages: DataFrame, threshold: float = 0.85) -> DataFrame:
    """J7 (issue_detector.py:1299-1431): weighted SequenceMatcher
    similarity over (title, meta_description, h1, word_count); pairs with
    score >= threshold are duplicates.

    Blocking (lossless for threshold > 0.65): a flagged pair needs
    title_sim >= (threshold-0.65)/0.35 and desc_sim >= (threshold-0.65)/0.35,
    hence both titles and both descriptions non-empty, and SequenceMatcher
    ratio = 2M/(l1+l2) <= 2*min(l)/ (l1+l2) forces a length-ratio bound
    min/max >= r/(2-r). We block on title-length bands sized to that
    bound (each side joins its own band and the next), then verify the
    exact staged formula per pair in an Arrow UDF — identical math to the
    reference, including its early exits (which only skip pairs that
    cannot reach the threshold)."""
    import math

    need = (threshold - (1.0 - DUP_WEIGHTS["title"])) / DUP_WEIGHTS["title"]
    if need <= 0:
        raise ValueError("threshold too low for lossless title blocking; use <=0.65 path")
    ratio_bound = need / (2.0 - need)  # min/max title length
    base = 1.0 / ratio_bound

    pairs = dup_candidate_pairs(pages, threshold)
    w = DUP_WEIGHTS

    def score_pairs(batches):
        from difflib import SequenceMatcher

        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.wc_a and r.wc_b:
                    mx, mn = max(r.wc_a, r.wc_b), min(r.wc_a, r.wc_b)
                    wc_sim = mn / mx if mx > 0 else 0.0
                else:
                    wc_sim = 0.0
                score = wc_sim * w["word_count"]
                max_pot = 1.0 - w["word_count"] + score
                if max_pot < threshold:
                    continue
                t_sim = SequenceMatcher(None, r.t_a, r.t_b).ratio() if (r.t_a and r.t_b) else 0.0
                score += t_sim * w["title"]
                max_pot = max_pot - w["title"] + t_sim * w["title"]
                if max_pot < threshold:
                    continue
                d_sim = SequenceMatcher(None, r.d_a, r.d_b).ratio() if (r.d_a and r.d_b) else 0.0
                score += d_sim * w["desc"]
                max_pot = max_pot - w["desc"] + d_sim * w["desc"]
                if max_pot < threshold:
                    continue
                h_sim = SequenceMatcher(None, r.h_a, r.h_b).ratio() if (r.h_a and r.h_b) else 0.0
                score += h_sim * w["h1"]
                if score >= threshold:
                    rows.append({"url_a": r.url_a, "url_b": r.url_b,
                                 "similarity": round(score, 6)})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["url_a", "url_b", "similarity"])

    return pairs.mapInPandas(
        score_pairs, schema="url_a string, url_b string, similarity double"
    )


def duplicate_content_issues(pages: DataFrame, threshold: float = 0.85) -> DataFrame:
    """Two issue rows per duplicate pair (issue_detector.py:1404-1420)."""
    p = duplicate_content_pairs(pages, threshold)
    pct = F.format_number(F.col("similarity") * 100, 1)
    a = p.select(
        F.col("url_a").alias("url"),
        F.concat(F.lit("Content is "), pct, F.lit("% similar to "), F.col("url_b")).alias("details"),
    )
    b = p.select(
        F.col("url_b").alias("url"),
        F.concat(F.lit("Content is "), pct, F.lit("% similar to "), F.col("url_a")).alias("details"),
    )
    return a.unionByName(b).select(
        "url", F.lit("warning").alias("type"), F.lit("Duplication").alias("category"),
        F.lit("Duplicate Content Detected").alias("issue"), "details",
    )
