"""Deterministic synthetic-web generator (FIXTURES.md §1-§4).

Produces the engine's authoritative input shape (BASELINE.json
input_hint): a ``documents`` table of interleaved text+media spans

    documents(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)

plus ``hosts`` (robots.txt / crawl-delay / sitemap) and ``seeds``.
Everything derives from one integer seed — same seed, same web —
so the pure-Python reference-transcription oracle and the Spark engine
crawl the identical corpus.

Span vocabulary (kind -> payload) is the contract between this module,
the extraction UDF (operators/extract.py) and the oracle
(oracle/refcrawl.py). Field packing uses unit-separator ``\\x1f``:

- http      text="status=200;content_type=text/html;size=1234;redirect=;retry_after="
            optional keys: rt=<ms> (synthetic response latency,
            crawler.py:1108), hdr=<csp,hsts,xfo subset present>
            (security response headers, issue_detector.py:1186-1247)
- title     text=title text
- meta      text="<name>\\x1f<content>"           (description, robots, viewport, ...)
- canonical text=href
- h1..h6    text=heading text
- text      text=body text run
- anchor    media_ref=href, text="<anchor>\\x1f<region>\\x1f<rel>\\x1f<target>"
            region in nav|footer|body; rel = space-separated tokens
            (nofollow noopener noreferrer); target "" or "_blank";
            3-field legacy spans parse with target=""
- media     media_ref=img src, text="<alt>\\x1f<w>\\x1f<h>"
- hreflang  text=lang code, media_ref=target URL
- jsonld    text=raw JSON-LD string (invalid JSON = skipped, like the
            reference's json.loads try/except)
- schemaorg text=itemtype URL, optionally SEP + JSON dict of itemprop
            properties (seo_extractor.py:264-301 microdata shape)

Mirrors what the reference extracts from HTML
(/root/reference/src/core/seo_extractor.py:10-301) without requiring a
DOM: the ``region`` field stands in for the ancestor walk of
link_manager.py:202-232 (placement), as FIXTURES.md prescribes.
"""

from __future__ import annotations

import json
import random
import zlib
from dataclasses import dataclass, field

SEP = "\x1f"

_WORDS = (
    "spark crawl frontier queue link page seo title meta robots sitemap "
    "index content quality depth host domain anchor canonical redirect "
    "status fetch parse extract issue audit graph wave shuffle partition "
    "bloom hash dedup scale executor catalyst tungsten arrow pandas batch"
).split()


def http_span(status=200, content_type="text/html", size=1000, redirect="",
              retry_after="", xrobots="", recover_after=0, recover_status=0,
              rt=0.0, hdr=""):
    """``recover_after=N`` (N>=1) models a host that recovers after N
    attempts: attempts 0..N-1 return ``status`` (a 429), attempt >= N
    returns ``recover_status``. Never combined with redirect statuses
    (requests re-follows the whole chain per attempt; the fixture keeps
    recovery on terminal hops only).

    ``rt`` is the hop's synthetic latency in ms (page response_time =
    sum over the redirect chain); ``hdr`` lists present security headers
    from {csp, hsts, xfo}, comma-separated (a site-wide host policy in
    generate_site, like real server config)."""
    text = (
        f"status={status};content_type={content_type};size={size};"
        f"redirect={redirect};retry_after={retry_after};xrobots={xrobots}"
    )
    if recover_after:
        text += f";recover_after={recover_after};recover_status={recover_status}"
    if rt:
        text += f";rt={rt}"
    if hdr:
        text += f";hdr={hdr}"
    return {"kind": "http", "text": text, "media_ref": "", "offset": 0}


@dataclass
class SiteGenConfig:
    seed: int = 42
    n_hosts: int = 8
    pages_base_host: int = 40          # pages on the seed host
    pages_other_host: int = 8
    fanout: int = 6                    # links per page
    frac_external: float = 0.2
    frac_special: float = 0.12         # mailto/tel/#/javascript hrefs
    trap_pages: int = 0                # /p/<n> pages on the seed host (trap section)
    near_dup_pairs: int = 2
    redirect_chains: bool = True
    robots_disallow: bool = True
    sitemap_index: bool = False        # base host: nested sitemapindex instead of flat urlset


@dataclass
class Site:
    documents: list = field(default_factory=list)   # rows {doc_id, spans}
    hosts: list = field(default_factory=list)       # rows {host, robots_txt, crawl_delay, sitemap_xml}
    seeds: list = field(default_factory=list)       # rows {url, priority}
    sitemap_bodies: dict = field(default_factory=dict)  # nested sitemap URL -> xml
    base_url: str = ""
    base_domain: str = ""


def _body_words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def generate_site(cfg: SiteGenConfig | None = None) -> Site:
    cfg = cfg or SiteGenConfig()
    rng = random.Random(cfg.seed)
    site = Site()

    hosts = [f"site{i}.example" for i in range(cfg.n_hosts)]
    base_host = hosts[0]
    site.base_url = f"https://{base_host}"
    site.base_domain = base_host
    site.seeds.append({"url": f"https://{base_host}/", "priority": 0})

    # --- page URL universe per host -------------------------------------
    pages_of: dict[str, list[str]] = {}
    for hi, host in enumerate(hosts):
        n = cfg.pages_base_host if hi == 0 else cfg.pages_other_host
        urls = [f"https://{host}/"]
        for k in range(1, n):
            sect = ("page", "blog", "docs")[k % 3]
            u = f"https://{host}/{sect}/{k}"
            # URL-structure pathologies (issue_detector.py:1037-1079):
            # underscores / repetitive path segments / >115-char URLs
            if k % 11 == 6:
                u = f"https://{host}/{sect}/entry_{k}_long_form"
            elif k % 13 == 9:
                u = f"https://{host}/{sect}/{sect}/{k}"
            elif k % 17 == 12:
                slug = "-".join(["very-long-descriptive-url-segment"] * 3) + f"-{k}"
                u = f"https://{host}/{sect}/{slug}"
            if k % 7 == 0:
                u += f"?id={k}&utm_source=gen"  # exercises canonical-key param strip
            urls.append(u)
        if hi == 0 and cfg.trap_pages:
            urls.extend(f"https://{host}/p/{n}" for n in range(cfg.trap_pages))
        pages_of[host] = urls

    all_pages = [u for h in hosts for u in pages_of[h]]

    # --- per-page generation ---------------------------------------------
    near_dup_budget = cfg.near_dup_pairs
    dup_base_text: str | None = None

    for host in hosts:
        urls = pages_of[host]
        for pi, url in enumerate(urls):
            # stable across processes (str.__hash__ is randomized; crc32 isn't)
            prng = random.Random(zlib.crc32(f"{cfg.seed}|{host}|{pi}".encode()))
            spans: list[dict] = []

            # status pathology mix (deterministic by page index)
            status, redirect, retry_after = 200, "", ""
            recover_after, recover_status = 0, 0
            is_trap_page = "/p/" in url
            if not is_trap_page and pi > 0:
                m = pi % 17
                if m == 5:
                    status = 404
                elif m == 9:
                    status = 500
                elif m == 13:
                    # 429 host: odd page index recovers after 2 attempts
                    # (within the default retries=3); even stays 429 past
                    # the retry budget — both reference outcomes exercised
                    status, retry_after = 429, "3"
                    if pi % 2 == 1:
                        recover_after, recover_status = 2, 200
                elif m == 11 and cfg.redirect_chains and pi + 1 < len(urls):
                    status, redirect = 301, urls[pi + 1]
                elif m == 15 and cfg.redirect_chains:
                    status, redirect = 302, urls[0]
            size = 500 + prng.randrange(4000)
            if not is_trap_page and pi % 29 == 17:
                size = 3 * 1024 * 1024 + 50_000  # Large Page Size (>3MB)
            xrobots = "noindex" if (pi % 13 == 7) else ""
            # latency + security headers derive from crc32 side-channels
            # (NOT prng) so adding them doesn't perturb the existing
            # deterministic draw sequence
            rtseed = zlib.crc32(f"rt|{url}".encode())
            rt = 3500.0 if rtseed % 19 == 3 else float(50 + rtseed % 1200)
            hdr = ("csp,hsts,xfo", "hsts,xfo", "csp", "")[hosts.index(host) % 4]
            spans.append(http_span(status, "text/html", size, redirect, retry_after,
                                   xrobots, recover_after, recover_status,
                                   rt=rt, hdr=hdr))

            if status in (301, 302):
                site.documents.append({"doc_id": url, "spans": spans})
                continue

            # title / meta pathology mix
            m = pi % 11
            if m != 3:  # m==3 -> missing title
                title = f"Page {pi} on {host}"
                if m == 7:
                    title = title + " " + _body_words(prng, 30)  # over-long
                spans.append({"kind": "title", "text": title, "media_ref": "", "offset": 0})
            if m != 4:
                spans.append({
                    "kind": "meta",
                    "text": f"description{SEP}Synthetic description {pi} for {host}",
                    "media_ref": "", "offset": 0,
                })
            if m == 6:
                spans.append({"kind": "meta", "text": f"robots{SEP}noindex, nofollow",
                              "media_ref": "", "offset": 0})
            spans.append({"kind": "meta", "text": f"viewport{SEP}width=device-width",
                          "media_ref": "", "offset": 0})
            spans.append({"kind": "lang", "text": ("en", "de", "es")[pi % 3],
                          "media_ref": "", "offset": 0})
            if pi % 5 != 4:
                spans.append({"kind": "charset", "text": "utf-8", "media_ref": "", "offset": 0})
            # OpenGraph / Twitter cards on a subset
            if pi % 4 == 1:
                spans.append({"kind": "og", "text": f"og:title{SEP}OG Page {pi}",
                              "media_ref": "", "offset": 0})
                spans.append({"kind": "og", "text": f"og:type{SEP}article",
                              "media_ref": "", "offset": 0})
            if pi % 5 == 2:
                spans.append({"kind": "twitter", "text": f"twitter:card{SEP}summary",
                              "media_ref": "", "offset": 0})
                spans.append({"kind": "twitter", "text": f"twitter:title{SEP}Tw {pi}",
                              "media_ref": "", "offset": 0})
            # analytics/tracking script snippets
            if pi % 6 == 1:
                spans.append({"kind": "script",
                              "text": f"gtag('config', 'G-ABCDE{pi % 10}BCDE'); "
                                      "src=https://www.googletagmanager.com/gtag/js",
                              "media_ref": "", "offset": 0})
            if pi % 9 == 4:
                spans.append({"kind": "script", "text": "fbq('init', '123'); hj('x');",
                              "media_ref": "", "offset": 0})
            # schema.org microdata types (+ itemprop properties on some)
            if pi % 7 == 3:
                so = "https://schema.org/Article"
                if pi % 14 == 3:
                    so += SEP + json.dumps(
                        {"author": f"a{pi % 5}", "name": f"p{pi}"}, sort_keys=True
                    )
                spans.append({"kind": "schemaorg", "text": so,
                              "media_ref": "", "offset": 0})

            # canonical: self / cross / missing
            if m not in (2, 8):
                canon = url if m != 5 else urls[0]
                spans.append({"kind": "canonical", "text": canon, "media_ref": "", "offset": 0})

            # headings: 0/1/2 h1s, some h2/h3
            if m != 9:
                spans.append({"kind": "h1", "text": f"Heading {pi}", "media_ref": "", "offset": 0})
                if m == 10:
                    spans.append({"kind": "h1", "text": f"Second heading {pi}",
                                  "media_ref": "", "offset": 0})
            for j in range(pi % 3):
                spans.append({"kind": "h2", "text": f"Section {j} of page {pi}",
                              "media_ref": "", "offset": 0})
            if pi % 4 == 1:
                spans.append({"kind": "h3", "text": f"Sub {pi}", "media_ref": "", "offset": 0})

            # body text (near-dup pairs share ~90% of text)
            n_words = 80 if m == 1 else 300 + prng.randrange(200)  # m==1 -> thin content
            body = _body_words(prng, n_words)
            if near_dup_budget > 0 and host == hosts[0] and pi in (6, 8):
                if dup_base_text is None:
                    dup_base_text = body
                else:
                    body = dup_base_text + " " + _body_words(prng, max(4, n_words // 12))
                    near_dup_budget -= 1
            spans.append({"kind": "text", "text": body, "media_ref": "", "offset": 0})

            # images (an absolute http:// src on an https page = mixed
            # content, issue_detector.py:1250-1288)
            for j in range(pi % 3):
                alt = "" if (pi + j) % 4 == 0 else f"img {j} of {pi}"
                w, h = ("", "") if (pi + j) % 5 == 0 else ("640", "480")
                src = f"/static/img_{pi}_{j}.png"
                if (pi + j) % 7 == 2:
                    src = f"http://{host}/static/img_{pi}_{j}.png"
                spans.append({"kind": "media", "text": f"{alt}{SEP}{w}{SEP}{h}",
                              "media_ref": src, "offset": 0})

            # json-ld on some pages: FAQ / complete Article / Organization /
            # plain Article (missing required fields) / invalid JSON
            if pi % 12 == 2:
                payload = json.dumps({
                    "@type": "FAQPage",
                    "mainEntity": [{"@type": "Question", "name": f"Q{pi}",
                                    "acceptedAnswer": {"@type": "Answer", "text": "A"}}],
                })
            elif pi % 12 == 8:
                payload = json.dumps({"@type": "Article", "name": f"p{pi}",
                                      "headline": f"H{pi}", "datePublished": "2024-01-01"})
            elif pi % 12 == 6:
                payload = json.dumps({"@type": "Organization", "name": f"org{pi}"})
            elif pi % 6 == 5:
                payload = "{not valid json"  # must be skipped silently
            elif pi % 6 == 4:
                payload = json.dumps({"@type": "Article", "name": f"p{pi}"})
            else:
                payload = None
            if payload is not None:
                spans.append({"kind": "jsonld", "text": payload,
                              "media_ref": "", "offset": 0})

            # links ---------------------------------------------------------
            # (href, text, region, rel, target); link-issue pathologies
            # (empty/generic anchors, _blank without noopener,
            # protocol-relative hrefs) derive from crc32 side-channels so
            # the historical prng draw sequence is untouched
            anchors: list[tuple[str, str, str, str, str]] = []
            hi = hosts.index(host)
            for j in range(cfg.fanout):
                r = prng.random()
                is_ext = False
                if r < cfg.frac_special:
                    href = ["#top", "mailto:a@b.c", "tel:+1234", "javascript:void(0)", ""][j % 5]
                elif r < cfg.frac_special + cfg.frac_external and cfg.n_hosts > 1:
                    other = hosts[(hi + 1 + prng.randrange(cfg.n_hosts - 1)) % cfg.n_hosts]
                    href = pages_of[other][prng.randrange(len(pages_of[other]))]
                    is_ext = True
                else:
                    target = urls[prng.randrange(len(urls))]
                    # mix absolute and relative forms
                    if prng.random() < 0.4:
                        href = target.split(host, 1)[1] or "/"
                    else:
                        href = target
                    if prng.random() < 0.1:
                        href += "#frag"
                region = ("body", "nav", "footer")[j % 3]
                rel = "nofollow" if prng.random() < 0.15 else ""
                text = f"link {j} from {pi}"
                tgt_attr = ""
                aseed = zlib.crc32(f"a|{url}|{j}".encode())
                if is_ext:
                    if aseed % 3 == 0:
                        tgt_attr = "_blank"  # no noopener -> unsafe cross-origin
                    elif aseed % 3 == 1:
                        tgt_attr = "_blank"
                        rel = (rel + " noopener").strip()
                    if aseed % 5 == 4 and href.startswith("https://"):
                        href = href[len("https:"):]  # protocol-relative
                if aseed % 7 == 2:
                    text = ""  # no anchor text
                elif not is_ext and aseed % 7 == 5:
                    text = ("click here", "read more", "more", "here")[aseed % 4]
                anchors.append((href, text, region, rel, tgt_attr))
            if is_trap_page:
                # trap section grows itself: /p/<n> links to /p/<n+1..n+3>
                n = int(url.rsplit("/", 1)[1])
                anchors = [(f"/p/{n + d}", f"trap {n + d}", "body", "", "")
                           for d in (1, 2, 3)]
            elif host == hosts[0] and pi == 0 and cfg.trap_pages:
                anchors.append(("/p/0", "trap entry", "body", "", ""))

            for li, (href, text, region, rel, tgt_attr) in enumerate(anchors):
                spans.append({
                    "kind": "anchor",
                    "text": f"{text}{SEP}{region}{SEP}{rel}{SEP}{tgt_attr}",
                    "media_ref": href, "offset": 0,
                })

            # hreflang pairs on a few pages
            if pi % 8 == 2 and len(urls) > pi + 1:
                spans.append({"kind": "hreflang", "text": "en", "media_ref": url, "offset": 0})
                spans.append({"kind": "hreflang", "text": "de",
                              "media_ref": urls[(pi + 1) % len(urls)], "offset": 0})

            for off, s in enumerate(spans):
                s["offset"] = off
            site.documents.append({"doc_id": url, "spans": spans})

    # --- hosts table -------------------------------------------------------
    for hi, host in enumerate(hosts):
        lines = [f"User-agent: *"]
        if cfg.robots_disallow and hi == 0:
            lines.append("Disallow: /docs/")
        if hi % 3 == 1:
            lines.append(f"Crawl-delay: {1 + hi}")
        lines.append(f"Sitemap: https://{host}/sitemap.xml")
        from xml.sax.saxutils import escape

        sm_pages = pages_of[host][: min(10, len(pages_of[host]))]

        def urlset(us):
            return ('<?xml version="1.0"?><urlset>'
                    + "".join(f"<url><loc>{escape(u)}</loc></url>" for u in us)
                    + "</urlset>")

        if hi == 0 and cfg.sitemap_index:
            # nested layout, same page URLs in the same depth-first order
            # as the flat urlset: root index -> [chunk-a, nested index ->
            # chunk-b] (exercises the 2-deep recursion of S6)
            half = (len(sm_pages) + 1) // 2
            a_url = f"https://{host}/sitemap-a.xml"
            b_url = f"https://{host}/sitemap-b.xml"
            idx2_url = f"https://{host}/sitemap-idx2.xml"
            site.sitemap_bodies[a_url] = urlset(sm_pages[:half])
            site.sitemap_bodies[b_url] = urlset(sm_pages[half:])
            site.sitemap_bodies[idx2_url] = (
                '<?xml version="1.0"?><sitemapindex>'
                f"<sitemap><loc>{b_url}</loc></sitemap></sitemapindex>"
            )
            sitemap = (
                '<?xml version="1.0"?><sitemapindex>'
                f"<sitemap><loc>{a_url}</loc></sitemap>"
                f"<sitemap><loc>{idx2_url}</loc></sitemap>"
                "</sitemapindex>"
            )
        else:
            sitemap = urlset(sm_pages)
        site.hosts.append({
            "host": host,
            "robots_txt": "\n".join(lines),
            "crawl_delay": float(1 + hi) if hi % 3 == 1 else 0.0,
            "sitemap_xml": sitemap,
        })

    return site


# --- IO helpers -------------------------------------------------------------

SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def site_to_spark(spark, site: Site):
    """Return (documents_df, hosts_df, seeds_df)."""
    docs = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in site.documents],
        schema=SPANS_DDL,
    )
    hosts = spark.createDataFrame(
        [(h["host"], h["robots_txt"], h["crawl_delay"], h["sitemap_xml"]) for h in site.hosts],
        schema="host string, robots_txt string, crawl_delay double, sitemap_xml string",
    )
    seeds = spark.createDataFrame(
        [(s["url"], s["priority"]) for s in site.seeds], schema="url string, priority int"
    )
    return docs, hosts, seeds


def write_site_parquet(site: Site, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    docs = pa.table({
        "doc_id": [d["doc_id"] for d in site.documents],
        "spans": pa.array(
            [[(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]]
             for d in site.documents],
            type=pa.list_(span_t),
        ),
    })
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    pq.write_table(pa.table({k: [h[k] for h in site.hosts]
                             for k in ("host", "robots_txt", "crawl_delay", "sitemap_xml")}),
                   f"{out_dir}/hosts.parquet")
    pq.write_table(pa.table({k: [s[k] for s in site.seeds] for k in ("url", "priority")}),
                   f"{out_dir}/seeds.parquet")
