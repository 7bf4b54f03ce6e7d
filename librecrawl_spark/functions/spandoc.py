"""Span-document parsing — pure per-document functions shared by the
reference-transcription oracle (tests) and the engine's Arrow pandas UDF
(operators/extract.py). One implementation, two callers: equivalence
tests therefore compare *scheduling/dedup/join* logic, never parsing.

The span vocabulary is defined in fixtures/sitegen.py. Extraction
semantics transcribe /root/reference/src/core/seo_extractor.py (cited
per function) re-expressed over spans instead of a DOM:

- word_count (seo_extractor.py:42-44): ``\\b\\w+\\b`` tokens over the
  page's visible text = title + headings + body runs + anchor texts
  (the span-world analogue of ``soup.get_text()``).
- images (seo_extractor.py:192-216): first 20, src absolutized.
- link counts (seo_extractor.py:218-248): www-insensitive host compare.
- hreflang (seo_extractor.py:253-262).
- placement comes from the anchor span's region field, standing in for
  the DOM ancestor walk of link_manager.py:202-232.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin, urlparse

from librecrawl_spark.functions import urls as U

SEP = "\x1f"
MAX_REDIRECTS = 10
# counting pattern: the reference counts \b\w+\b matches — a maximal
# \w+ run always starts and ends on a word boundary and \b\w+\b can
# never match a partial run (the inner \b would fail), so the match
# LISTS are identical and the plain \w+ scan is ~1.8x faster
# (tests/test_spandoc.py asserts count equality on random text)
_WORD_RE = re.compile(r"\w+")


def parse_http(spans, attempt: int = 0) -> dict:
    """Decode the synthetic response-metadata span (fixture 'http' kind).

    ``attempt`` models re-requests: a span with recover_after=N returns
    recover_status from attempt N onward (a rate-limited host coming
    back between retry attempts)."""
    for s in spans:
        if s["kind"] == "http":
            d = dict(p.split("=", 1) for p in s["text"].split(";") if "=" in p)
            status = int(d.get("status", "0") or 0)
            recover_after = int(d.get("recover_after", "0") or 0)
            if recover_after and attempt >= recover_after:
                status = int(d.get("recover_status", "0") or 0)
            return {
                "status": status,
                "content_type": d.get("content_type", ""),
                "size": int(d.get("size", "0") or 0),
                "redirect": d.get("redirect", ""),
                "retry_after": d.get("retry_after", ""),
                "xrobots": d.get("xrobots", ""),
                "recover_after": recover_after,
                "rt": float(d.get("rt", "0") or 0.0),
                "hdr": d.get("hdr", ""),
            }
    return {"status": 0, "content_type": "", "size": 0, "redirect": "",
            "retry_after": "", "xrobots": "", "recover_after": 0,
            "rt": 0.0, "hdr": ""}


def _split3(text: str) -> tuple[str, str, str]:
    parts = text.split(SEP)
    while len(parts) < 3:
        parts.append("")
    return parts[0], parts[1], parts[2]


def _split4(text: str) -> tuple[str, str, str, str]:
    parts = text.split(SEP)
    while len(parts) < 4:
        parts.append("")
    return parts[0], parts[1], parts[2], parts[3]


def anchors_of(spans):
    """Ordered anchor tuples (href, anchor_text, region, rel, target).
    ``rel`` is a space-separated token string (nofollow noopener ...);
    legacy 3-field spans parse with target=''."""
    out = []
    for s in spans:
        if s["kind"] == "anchor":
            text, region, rel, target = _split4(s["text"])
            out.append((s["media_ref"], text, region, rel, target))
    return out


# security response headers the fixture's ``hdr`` tokens stand for
# (issue_detector.py:1186-1247 checks membership, lowercased)
_HDR_TOKENS = {
    "csp": ("content-security-policy", "default-src 'self'"),
    "hsts": ("strict-transport-security", "max-age=31536000"),
    "xfo": ("x-frame-options", "SAMEORIGIN"),
}


def headers_map(hdr: str) -> dict:
    """Expand the http span's ``hdr`` token list into the page's
    response_headers dict (lowercase names, like requests' CaseInsensitive
    headers normalized once at extraction)."""
    out = {}
    for tok in (hdr or "").split(","):
        tok = tok.strip()
        if tok in _HDR_TOKENS:
            name, value = _HDR_TOKENS[tok]
            out[name] = value
    return out


# AI-ready schema types (issue_detector.py:682-701)
AI_READY_TYPES = {
    "FAQPage": ("FAQ", "FAQ Accordion"),
    "HowTo": ("How-To", "Step-by-step Guide"),
    "Recipe": ("Recipe", "Recipe Card"),
    "Product": ("Product", "Product Snippet"),
    "Review": ("Review", "Review Stars"),
    "AggregateRating": ("Rating", "Star Rating"),
    "LocalBusiness": ("Local Business", "Knowledge Panel"),
    "Organization": ("Organization", "Knowledge Panel"),
    "Person": ("Person", "Knowledge Panel"),
    "Article": ("Article", "Article Preview"),
    "NewsArticle": ("News Article", "News Carousel"),
    "BlogPosting": ("Blog Post", "Article Preview"),
    "Event": ("Event", "Event Listing"),
    "JobPosting": ("Job Posting", "Job Listing"),
    "Course": ("Course", "Course Card"),
    "SoftwareApplication": ("Software App", "App Info"),
    "VideoObject": ("Video", "Video Preview"),
    "BreadcrumbList": ("Breadcrumbs", "Breadcrumb Trail"),
}


def structured_data_fields(json_ld_objs: list, schema_org_items: list) -> dict:
    """Schema analysis over parsed JSON-LD + microdata — transcription of
    issue_detector._check_structured_data_issues' extract_type recursion
    (issue_detector.py:727-790): recursive @type collection (depth<=10),
    FAQ Question counting, Organization/WebSite flags, Article
    required-field check (json-ld only, top-level @type). detected types
    are SORTED for determinism (the reference materializes a set)."""
    detected: set = set()
    faq_count = 0
    has_org = False
    has_web = False

    def walk(obj, depth=0):
        nonlocal faq_count, has_org, has_web
        if depth > 10:
            return
        if isinstance(obj, dict):
            t = obj.get("@type")
            if t:
                ts = t if isinstance(t, list) else [t]
                for x in ts:
                    detected.add(x)
                if "FAQPage" in ts:
                    main = obj.get("mainEntity", [])
                    if isinstance(main, list):
                        for item in main:
                            if isinstance(item, dict) and item.get("@type") == "Question" \
                                    and item.get("name", ""):
                                faq_count += 1
                if any(x in ("Organization", "LocalBusiness", "Corporation") for x in ts):
                    has_org = True
                if "WebSite" in ts:
                    has_web = True
            for v in obj.values():
                if isinstance(v, (dict, list)):
                    walk(v, depth + 1)
        elif isinstance(obj, list):
            for item in obj:
                walk(item, depth + 1)

    for obj in json_ld_objs:
        walk(obj)
    for item in schema_org_items:
        t = item.get("type", "")
        if t:
            detected.add(t.split("/")[-1] if "/" in t else t)

    types = sorted(detected)
    article_ok = False
    for obj in json_ld_objs:
        if isinstance(obj, dict) and obj.get("@type") in ("Article", "BlogPosting", "NewsArticle"):
            if obj.get("headline") and obj.get("datePublished"):
                article_ok = True
                break
    return {
        "schema_types": types,
        "ai_ready": [
            {"name": AI_READY_TYPES[t][0], "rich_result": AI_READY_TYPES[t][1]}
            for t in types if t in AI_READY_TYPES
        ],
        "faq_count": faq_count,
        "has_organization": has_org,
        "has_website": has_web,
        "article_fields_ok": article_ok,
    }


def _parse_schemaorg_span(text: str) -> dict:
    """schemaorg span: itemtype [SEP json-properties] ->
    {type, properties} (seo_extractor.py:264-301 microdata shape)."""
    parts = text.split(SEP, 1)
    props: dict = {}
    if len(parts) > 1:
        try:
            loaded = json.loads(parts[1])
            if isinstance(loaded, dict):
                props = {str(k): str(v) for k, v in loaded.items()}
        except (json.JSONDecodeError, TypeError):
            props = {}
    return {"type": parts[0], "properties": props}


def extract_page(url: str, spans, base_domain: str) -> dict:
    """Per-page SEO record — field-for-field vs seo_extractor.py:10-301
    (basic data, meta, canonical, images, link counts, hreflang) over the
    span encoding. Caps transcribed: h2/h3 first 10 (:36-39), images
    first 20 (:197), anchor text 100 chars (link_manager.py:131)."""
    title = ""
    meta: dict[str, str] = {}
    og_tags: dict[str, str] = {}
    twitter_tags: dict[str, str] = {}
    canonical = ""
    lang = ""
    charset = ""
    h1_list: list[str] = []
    headings: list[dict] = []
    h2: list[str] = []
    h3: list[str] = []
    body_texts: list[str] = []
    script_texts: list[str] = []
    images: list[dict] = []
    hreflang: list[dict] = []
    json_ld_objs: list = []
    schema_org: list[dict] = []

    for s in spans:
        k = s["kind"]
        if k == "title" and not title:
            title = s["text"].strip()
        elif k == "meta":
            name, content, _ = _split3(s["text"])
            name = name.lower()
            if name and name not in meta:
                meta[name] = content
        elif k == "og":
            # seo_extractor.py:117-125 — og: prefix stripped into og_tags
            prop, content, _ = _split3(s["text"])
            if prop:
                og_tags[prop.replace("og:", "")] = content
        elif k == "twitter":
            # seo_extractor.py:127-137
            name, content, _ = _split3(s["text"])
            if name:
                twitter_tags[name.replace("twitter:", "")] = content
        elif k == "lang" and not lang:
            lang = s["text"]
        elif k == "charset" and not charset:
            charset = s["text"]
        elif k == "script":
            script_texts.append(s["text"])
        elif k == "schemaorg":
            schema_org.append(_parse_schemaorg_span(s["text"]))
        elif k == "canonical" and not canonical:
            canonical = s["text"]
        elif k in ("h1", "h2", "h3", "h4", "h5", "h6"):
            txt = s["text"].strip()
            headings.append({"level": int(k[1]), "text": txt})
            if k == "h1":
                h1_list.append(txt)
            elif k == "h2":
                h2.append(txt)
            elif k == "h3":
                h3.append(txt)
        elif k == "text":
            body_texts.append(s["text"])
        elif k == "media":
            if len(images) < 20:
                alt, w, h = _split3(s["text"])
                src = s["media_ref"]
                if src:
                    if src.startswith("//"):
                        src = "https:" + src
                    elif src.startswith("/"):
                        p = urlparse(url)
                        src = f"{p.scheme}://{p.netloc}{src}"
                    elif not src.startswith(("http://", "https://")):
                        src = urljoin(url, src)
                    images.append({"src": src, "alt": alt, "width": w, "height": h})
        elif k == "hreflang":
            if s["text"] and s["media_ref"]:
                hreflang.append({"lang": s["text"], "url": s["media_ref"]})
        elif k == "jsonld":
            try:
                json_ld_objs.append(json.loads(s["text"]))
            except (json.JSONDecodeError, TypeError):
                # invalid JSON-LD is skipped silently (seo_extractor.py:144-149)
                pass

    internal_links = 0
    external_links = 0
    anchor_texts: list[str] = []
    links_data: list[dict] = []
    for href, text, _region, rel, target in anchors_of(spans):
        anchor_texts.append(text)
        # seo_extractor.py:225 — javascript: IS excluded here (unlike F1)
        if href and not href.startswith(("#", "mailto:", "tel:", "javascript:")):
            absolute = urljoin(url, href)
            is_int = U.strip_www(urlparse(absolute).netloc) == U.strip_www(base_domain)
            if is_int:
                internal_links += 1
            else:
                external_links += 1
            # seo_extractor.py:239-247 — detailed link data (raw href,
            # raw stripped text, rel token list, target, exact-domain
            # is_internal — note: NOT the subdomain scope of
            # collect_all_links)
            links_data.append({
                "href": href,
                "absolute_url": absolute,
                "text": text.strip(),
                "rel": rel.split() if rel else [],
                "target": target,
                "is_internal": is_int,
            })

    visible_text = " ".join(
        [title] + [h["text"] for h in headings] + body_texts + anchor_texts
    )
    word_count = len(_WORD_RE.findall(visible_text))

    # analytics detection (seo_extractor.py:151-190) over the span-world
    # 'html content' = script span texts
    html_content = " ".join(script_texts)
    ga4 = re.search(r"G-[A-Z0-9]{10}", html_content)
    gtm = re.search(r"GTM-[A-Z0-9]+", html_content)
    analytics = {
        "google_analytics": bool(re.search(
            r"gtag\(|ga\(|GoogleAnalyticsObject|google-analytics\.com|googletagmanager\.com",
            html_content, re.IGNORECASE)),
        "gtag": bool(ga4),
        "ga4_id": ga4.group() if ga4 else "",
        "gtm_id": gtm.group() if gtm else "",
        "facebook_pixel": bool(re.search(r"fbq\(|facebook\.com/tr", html_content, re.IGNORECASE)),
        "hotjar": bool(re.search(r"hotjar\.com|hj\(", html_content, re.IGNORECASE)),
        "mixpanel": bool(re.search(r"mixpanel\.com|mixpanel\.track", html_content, re.IGNORECASE)),
    }

    return {
        "lang": lang,
        "charset": charset,
        "og_tags": og_tags,
        "twitter_tags": twitter_tags,
        "analytics": analytics,
        "schema_org": schema_org,
        "title": title,
        "meta_description": meta.get("description", "").strip(),
        "h1": h1_list[0] if h1_list else "",
        "h1_list": h1_list,
        "headings_structure": headings,
        "h2": h2[:10],
        "h3": h3[:10],
        "word_count": word_count,
        "canonical_url": canonical,
        "robots": meta.get("robots", ""),
        "viewport": meta.get("viewport", ""),
        "images": images,
        "internal_links": internal_links,
        "external_links": external_links,
        "links_data": links_data,
        "hreflang": hreflang,
        "json_ld": [json.dumps(o, sort_keys=True, separators=(",", ":"))
                    for o in json_ld_objs],
        "json_ld_count": len(json_ld_objs),
        **structured_data_fields(json_ld_objs, schema_org),
    }


def collect_links(url: str, spans, base_domain: str):
    """Report-graph links — transcription of link_manager.py:120-199
    (``collect_all_links``): urljoin, fragment split on '#', http(s)-only,
    scope/is_internal/placement/nofollow; anchor text capped at 100 chars,
    '(no text)' fallback. Dedup on (source,target) is done by the caller
    (engine: dropDuplicates; oracle: links_set)."""
    out = []
    for href, text, region, rel, _target in anchors_of(spans):
        if not href:
            continue
        absolute = urljoin(url, href)
        if "#" in absolute:
            absolute = absolute.split("#")[0]
        if not absolute.startswith(("http://", "https://")):
            continue
        scope = U.determine_scope(absolute, base_domain)
        out.append({
            "source_url": url,
            "target_url": absolute,
            "anchor_text": text.strip()[:100] or "(no text)",
            "is_internal": scope in ("root", "sub"),
            "target_domain": urlparse(absolute).netloc,
            "placement": {"nav": "navigation", "footer": "footer"}.get(region, "body"),
            # 'nofollow' in a_tag.get('rel', []) — token membership
            # (link_manager.py:167)
            "nofollow": "nofollow" in rel.split(),
            "scope": scope,
        })
    return out


def frontier_candidates(url: str, spans):
    """Frontier-growth candidates — the pure prefix of
    link_manager.py:43-68 (``extract_links``): special-scheme skip (F1,
    link_manager.py:57-59) + absolutize/fragment-strip (F2, :62-68).
    Returns ordered (clean_url, link_idx, signature); dedup/trap/policy
    are relational stages applied by the engine (operators/frontier.py)
    and sequentially by the oracle."""
    out = []
    for idx, (href, _text, _region, _rel, _tgt) in enumerate(anchors_of(spans)):
        href = href.strip()
        if U.is_special_href(href):
            continue
        clean = U.reference_clean(href, url)
        out.append({
            "clean_url": clean,
            "link_idx": idx,
            "signature": U.url_signature(clean),
            "host": urlparse(clean).netloc,
        })
    return out


_SPECIAL_COUNT_PREFIXES = ("#", "mailto:", "tel:", "javascript:")
_PLACEMENT = {"nav": "navigation", "footer": "footer"}


def extract_all(url: str, spans, base_domain: str, *, want_links: bool = True,
                want_cands: bool = True, href_memo: dict | None = None):
    """ENGINE-ONLY fused extraction: extract_page + collect_links +
    frontier_candidates in ONE span walk with ONE urljoin/urlparse per
    anchor (they each re-walked spans and re-parsed every href — ~2x the
    Python time of the extraction stage). The oracle keeps the three
    separate transcriptions; tests/test_crawl_e2e.py enforces that this
    fused path is byte-identical to them. Returns (page, links, cands).

    ``href_memo`` caches the href-derived tuple (absolute URL, link
    scope, candidate clean/signature/host) across pages within one
    Arrow worker — nav/footer hrefs repeat on every page of a host, and
    urljoin/urlparse dominate the walk's profile. The key pins every
    input the derivation depends on: absolute hrefs are base-independent
    (key = href), root-relative hrefs depend only on the page origin
    (key = (origin, href)), other relatives on the full page URL. First
    occurrence always computes through the exact original code path."""
    title = ""
    meta: dict[str, str] = {}
    og_tags: dict[str, str] = {}
    twitter_tags: dict[str, str] = {}
    canonical = ""
    lang = ""
    charset = ""
    h1_list: list[str] = []
    headings: list[dict] = []
    h2: list[str] = []
    h3: list[str] = []
    body_texts: list[str] = []
    script_texts: list[str] = []
    images: list[dict] = []
    hreflang: list[dict] = []
    json_ld_objs: list = []
    schema_org: list[dict] = []
    internal_links = 0
    external_links = 0
    anchor_texts: list[str] = []
    links_data: list[dict] = []
    links: list[dict] = []
    cands: list[dict] = []
    base_www = U.strip_www(base_domain)
    scope_base = base_domain.replace("www.", "")
    anchor_idx = 0
    if href_memo is None:
        href_memo = {}
    # page origin for root-relative memo keys: scheme://netloc (the only
    # base parts RFC-3986 uses to join a "/"-rooted reference)
    sl = url.find("/", url.find("://") + 3) if "://" in url else -1
    origin = url[:sl] if sl > 0 else url

    for s in spans:
        k = s["kind"]
        if k == "anchor":
            text, region, rel, target = _split4(s["text"])
            anchor_texts.append(text)
            href = s["media_ref"]
            idx = anchor_idx
            anchor_idx += 1
            # empty href: no count/links row (guarded by `if href` in the
            # unfused paths) and no candidate (is_special_href('') is True)
            if href:
                if href.startswith(("http://", "https://")):
                    mkey = href
                elif href[0] == "/":
                    mkey = (origin, href)
                else:
                    mkey = (url, href)
                ent = href_memo.get(mkey)
                if ent is None:
                    absolute = urljoin(url, href)
                    parsed = urlparse(absolute)
                    # seo_extractor.py:225 www-insensitive count domain
                    is_int_cnt = U.strip_www(parsed.netloc) == base_www
                    # collect_all_links (link_manager.py:120-199)
                    if "#" in absolute:
                        tgt = absolute.split("#")[0]
                        tgt_netloc = urlparse(tgt).netloc
                    else:
                        tgt, tgt_netloc = absolute, parsed.netloc
                    if tgt.startswith(("http://", "https://")):
                        url_clean = tgt_netloc.replace("www.", "")
                        if url_clean == scope_base:
                            scope = "root"
                        elif url_clean.endswith("." + scope_base):
                            scope = "sub"
                        else:
                            scope = "external"
                    else:
                        scope = None
                    hs = href.strip()
                    if U.is_special_href(hs):
                        clean = sig = host = None
                    else:
                        if hs == href:
                            # reuse the parse: reference_clean rebuilds
                            # from the same urljoin/urlparse
                            # (link_manager.py:62-68)
                            clean = f"{parsed.scheme}://{parsed.netloc}{parsed.path}"
                            if parsed.query:
                                clean += f"?{parsed.query}"
                            path = parsed.path
                            host = parsed.netloc
                        else:
                            clean = U.reference_clean(hs, url)
                            cp = urlparse(clean)
                            path, host = cp.path, cp.netloc
                        sig = U._DIGITS_RE.sub(r"\\d+", path)
                        sig = U._UUID_RE.sub(r"\\uuid", sig)
                    ent = (absolute, is_int_cnt, tgt, tgt_netloc, scope,
                           clean, sig, host)
                    if len(href_memo) < 200_000:
                        href_memo[mkey] = ent
                (absolute, is_int_cnt, tgt, tgt_netloc, scope,
                 clean, sig, host) = ent
                # seo_extractor.py:225 link counting (javascript: excluded here)
                if not href.startswith(_SPECIAL_COUNT_PREFIXES):
                    if is_int_cnt:
                        internal_links += 1
                    else:
                        external_links += 1
                    # seo_extractor.py:239-247 links_data (raw href/text,
                    # rel tokens, target, exact-domain is_internal)
                    links_data.append({
                        "href": href,
                        "absolute_url": absolute,
                        "text": text.strip(),
                        "rel": rel.split() if rel else [],
                        "target": target,
                        "is_internal": is_int_cnt,
                    })
                if want_links and scope is not None:
                    links.append({
                        "source_url": url,
                        "target_url": tgt,
                        "anchor_text": text.strip()[:100] or "(no text)",
                        "is_internal": scope in ("root", "sub"),
                        "target_domain": tgt_netloc,
                        "placement": _PLACEMENT.get(region, "body"),
                        "nofollow": "nofollow" in rel.split(),
                        "scope": scope,
                    })
                if want_cands and clean is not None:
                    cands.append({
                        "clean_url": clean,
                        "link_idx": idx,
                        "signature": sig,
                        "host": host,
                    })
        elif k == "title":
            if not title:
                title = s["text"].strip()
        elif k == "meta":
            name, content, _ = _split3(s["text"])
            name = name.lower()
            if name and name not in meta:
                meta[name] = content
        elif k == "og":
            prop, content, _ = _split3(s["text"])
            if prop:
                og_tags[prop.replace("og:", "")] = content
        elif k == "twitter":
            name, content, _ = _split3(s["text"])
            if name:
                twitter_tags[name.replace("twitter:", "")] = content
        elif k == "lang":
            if not lang:
                lang = s["text"]
        elif k == "charset":
            if not charset:
                charset = s["text"]
        elif k == "script":
            script_texts.append(s["text"])
        elif k == "schemaorg":
            schema_org.append(_parse_schemaorg_span(s["text"]))
        elif k == "canonical":
            if not canonical:
                canonical = s["text"]
        elif k in ("h1", "h2", "h3", "h4", "h5", "h6"):
            txt = s["text"].strip()
            headings.append({"level": int(k[1]), "text": txt})
            if k == "h1":
                h1_list.append(txt)
            elif k == "h2":
                h2.append(txt)
            elif k == "h3":
                h3.append(txt)
        elif k == "text":
            body_texts.append(s["text"])
        elif k == "media":
            if len(images) < 20:
                alt, w, h = _split3(s["text"])
                src = s["media_ref"]
                if src:
                    if src.startswith("//"):
                        src = "https:" + src
                    elif src.startswith("/"):
                        p = urlparse(url)
                        src = f"{p.scheme}://{p.netloc}{src}"
                    elif not src.startswith(("http://", "https://")):
                        src = urljoin(url, src)
                    images.append({"src": src, "alt": alt, "width": w, "height": h})
        elif k == "hreflang":
            if s["text"] and s["media_ref"]:
                hreflang.append({"lang": s["text"], "url": s["media_ref"]})
        elif k == "jsonld":
            try:
                json_ld_objs.append(json.loads(s["text"]))
            except (json.JSONDecodeError, TypeError):
                pass

    visible_text = " ".join(
        [title] + [h["text"] for h in headings] + body_texts + anchor_texts
    )
    word_count = len(_WORD_RE.findall(visible_text))

    html_content = " ".join(script_texts)
    ga4 = re.search(r"G-[A-Z0-9]{10}", html_content)
    gtm = re.search(r"GTM-[A-Z0-9]+", html_content)
    analytics = {
        "google_analytics": bool(re.search(
            r"gtag\(|ga\(|GoogleAnalyticsObject|google-analytics\.com|googletagmanager\.com",
            html_content, re.IGNORECASE)),
        "gtag": bool(ga4),
        "ga4_id": ga4.group() if ga4 else "",
        "gtm_id": gtm.group() if gtm else "",
        "facebook_pixel": bool(re.search(r"fbq\(|facebook\.com/tr", html_content, re.IGNORECASE)),
        "hotjar": bool(re.search(r"hotjar\.com|hj\(", html_content, re.IGNORECASE)),
        "mixpanel": bool(re.search(r"mixpanel\.com|mixpanel\.track", html_content, re.IGNORECASE)),
    }

    page = {
        "lang": lang,
        "charset": charset,
        "og_tags": og_tags,
        "twitter_tags": twitter_tags,
        "analytics": analytics,
        "schema_org": schema_org,
        "title": title,
        "meta_description": meta.get("description", "").strip(),
        "h1": h1_list[0] if h1_list else "",
        "h1_list": h1_list,
        "headings_structure": headings,
        "h2": h2[:10],
        "h3": h3[:10],
        "word_count": word_count,
        "canonical_url": canonical,
        "robots": meta.get("robots", ""),
        "viewport": meta.get("viewport", ""),
        "images": images,
        "internal_links": internal_links,
        "external_links": external_links,
        "links_data": links_data,
        "hreflang": hreflang,
        "json_ld": [json.dumps(o, sort_keys=True, separators=(",", ":"))
                    for o in json_ld_objs],
        "json_ld_count": len(json_ld_objs),
        **structured_data_fields(json_ld_objs, schema_org),
    }
    return page, links, cands


def resolve_fetch(url: str, docs: dict, attempt: int = 0) -> dict:
    """Simulated fetch with redirect following — the sandbox stand-in for
    crawler.py:944-976 (requests.get with allow_redirects): returns final
    doc + redirect chain. ``docs`` maps doc_id -> spans. A missing doc is
    a connection error (status 0, crawler.py:1120 exception path); more
    than MAX_REDIRECTS hops or a loop is a TooManyRedirects error."""
    chain = []
    cur = url
    seen_chain = {url}
    hops = 0
    rt_total = 0.0
    while True:
        spans = docs.get(cur)
        if spans is None and urlparse(cur).path == "":
            # HTTP: a host-root URL with no path fetches "/"
            spans = docs.get(cur + "/")
        if spans is None:
            return {"error": "fetch failed", "status": 0, "final_url": cur,
                    "chain": chain, "spans": None, "http": None, "rt_total": 0.0}
        http = parse_http(spans, attempt)
        rt_total += http["rt"]
        if http["status"] in (301, 302, 303, 307, 308) and http["redirect"]:
            chain.append({"url": cur, "status_code": http["status"], "hop": len(chain) + 1})
            hops += 1
            nxt = http["redirect"]
            if hops > MAX_REDIRECTS or nxt in seen_chain:
                return {"error": "too many redirects", "status": 0, "final_url": cur,
                        "chain": chain, "spans": None, "http": None, "rt_total": 0.0}
            seen_chain.add(nxt)
            cur = nxt
            continue
        if chain:
            chain.append({"url": cur, "status_code": http["status"],
                          "hop": len(chain) + 1, "final": True})
        # response_time = summed hop latency of this (final) attempt —
        # the fixture analogue of crawler.py:1108's wall-clock ms
        return {"error": None, "status": http["status"], "final_url": cur,
                "chain": chain, "spans": spans, "http": http,
                "rt_total": rt_total}


def retry_fetch(url: str, docs: dict, retries: int, base_delay: float):
    """The reference's 429 retry loop (crawler.py:941-976): up to
    ``retries`` retries on a 429 response, waiting min(Retry-After or
    base_delay * 2^attempt, 30) seconds between attempts; any other
    status breaks immediately. Each attempt is a fresh GET following
    redirects. Returns (fetch, retry_count, backoff_total_seconds)."""
    total_wait = 0.0
    attempt = 0
    while True:
        fetch = resolve_fetch(url, docs, attempt=attempt)
        status = fetch["http"]["status"] if fetch["http"] else 0
        if status == 429 and attempt < retries:
            ra = fetch["http"]["retry_after"]
            try:
                wait = float(int(ra))  # int() like crawler.py:958; ValueError -> backoff
            except (TypeError, ValueError):
                wait = base_delay * (2 ** attempt)
            total_wait += min(wait, 30.0)  # cap, crawler.py:966
            attempt += 1
            continue
        return fetch, attempt, total_wait
