"""Reference-transcription oracle: a single-threaded, pure-Python crawl
over the span-document fixture reproducing LibreCrawl's concurrency-1
behaviour exactly. This is the golden oracle for the end-to-end
equivalence tests (SURVEY.md §5 item 3): the Spark engine must match its
URL-seen set, crawl ordering, page records, link graph and trap set.

Transcribed control flow:
- frontier deque + all_discovered dedup + trap gate + policy callback:
  /root/reference/src/core/link_manager.py:43-118 (extract_links),
  :241-258 (add_url/get_next_url)
- worker loop (pop -> depth gate -> fetch -> extract -> grow):
  /root/reference/src/crawler.py:757-899 (_crawl_worker, concurrency=1)
- per-URL pipeline: /root/reference/src/crawler.py:909-1120
- policy: /root/reference/src/crawler.py:1425-1492 (_should_crawl_url)
- robots: /root/reference/src/crawler.py:1494-1560 (RobotFileParser,
  cached per host; unreadable robots => allow)

NOTE: ``visited_urls``/``mark_visited`` is never called during a live
crawl in the reference (only on resume, crawler.py:519-520); dedup rests
solely on ``all_discovered_urls`` — transcribed faithfully.
"""

from __future__ import annotations

import urllib.robotparser
from collections import deque
from urllib.parse import urlparse

from librecrawl_spark.config import CrawlConfig
from librecrawl_spark.functions import spandoc, urls as U


class ReferenceCrawlOracle:
    def __init__(self, documents: list[dict], hosts: list[dict],
                 base_url: str, config: CrawlConfig,
                 sitemap_bodies: dict[str, str] | None = None):
        self.docs = {d["doc_id"]: d["spans"] for d in documents}
        self.robots_txt = {h["host"]: h["robots_txt"] for h in hosts}
        self.sitemap_xml_by_host = {h["host"]: h.get("sitemap_xml") for h in hosts}
        self.sitemap_bodies = sitemap_bodies or {}
        self.config = config.for_seed(base_url)
        self.base_url = base_url
        self.base_domain = urlparse(base_url).netloc

        self.queue: deque = deque()          # (url, depth)
        self.all_discovered: set[str] = set()
        self.discovery_order: list[tuple[str, int]] = []  # (url, depth) in enqueue order
        self.pages: list[dict] = []
        self.links: list[dict] = []
        self._links_set: set[str] = set()
        self.source_pages: dict[str, list[str]] = {}
        self.pattern_counts: dict[str, int] = {}
        self.traps: dict[str, dict] = {}
        self.fetch_order: list[tuple[str, int]] = []      # (url, depth) in fetch order
        self._robots_cache: dict[str, urllib.robotparser.RobotFileParser | None] = {}

    # --- robots (crawler.py:1494-1560) -----------------------------------
    def _robots_allows(self, url: str) -> bool:
        host = urlparse(url).netloc
        if host not in self._robots_cache:
            txt = self.robots_txt.get(host)
            if txt is None:
                # unreadable robots.txt => allow (crawler.py:1543-1546)
                self._robots_cache[host] = None
            else:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(txt.splitlines())
                self._robots_cache[host] = rp
        rp = self._robots_cache[host]
        return True if rp is None else rp.can_fetch(self.config.user_agent, url)

    def _should_crawl(self, url: str) -> bool:
        c = self.config
        return U.should_crawl(
            url, self.base_domain,
            crawl_external=c.crawl_external,
            crawl_subdomains=c.crawl_subdomains,
            include_extensions=tuple(c.include_extensions),
            exclude_extensions=tuple(c.exclude_extensions),
            include_patterns=tuple(c.include_patterns),
            exclude_patterns=tuple(c.exclude_patterns),
            robots_allows=self._robots_allows if c.respect_robots else None,
        )

    # --- link_manager.add_url (link_manager.py:241-246) ------------------
    def add_url(self, url: str, depth: int) -> None:
        if url not in self.all_discovered:
            self.all_discovered.add(url)
            self.queue.append((url, depth))
            self.discovery_order.append((url, depth))

    # --- link_manager.extract_links (link_manager.py:43-118) -------------
    def _extract_links(self, url: str, spans, depth: int) -> None:
        for cand in spandoc.frontier_candidates(url, spans):
            clean_url = cand["clean_url"]
            # source-page tracking happens before any skip (:73-76)
            self.source_pages.setdefault(clean_url, [])
            if url not in self.source_pages[clean_url]:
                self.source_pages[clean_url].append(url)
            if clean_url in self.all_discovered or clean_url == url:
                continue
            signature = cand["signature"]
            count = self.pattern_counts.get(signature, 0)
            if count >= self.config.trap_threshold:
                t = self.traps.setdefault(
                    signature, {"pattern": signature, "example_url": clean_url, "count": 0}
                )
                t["count"] += 1
                continue
            if self._should_crawl(clean_url):
                self.pattern_counts[signature] = count + 1
                self.all_discovered.add(clean_url)
                self.queue.append((clean_url, depth))
                self.discovery_order.append((clean_url, depth))

    # --- link_manager.collect_all_links (link_manager.py:120-199) --------
    def _collect_links(self, url: str, spans) -> None:
        for link in spandoc.collect_links(url, spans, self.base_domain):
            tgt = link["target_url"]
            self.source_pages.setdefault(tgt, [])
            if url not in self.source_pages[tgt]:
                self.source_pages[tgt].append(url)
            key = f"{link['source_url']}|{tgt}"
            if key not in self._links_set:
                self._links_set.add(key)
                self.links.append(dict(link, target_status=None))

    # --- crawler._crawl_url_with_requests (crawler.py:909-1120) ----------
    def _crawl_url(self, url: str, depth: int) -> dict:
        cfg = self.config
        # S2: HEAD max_file_size gate (crawler.py:916-931) — HEAD follows
        # redirects, so the gate sees the final hop's content-length; a
        # failing HEAD is ignored ("except: pass").
        if cfg.max_file_size > 0:
            head = spandoc.resolve_fetch(url, self.docs)
            if head["error"] is None and head["http"]["size"] > cfg.max_file_size:
                result = {
                    "url": url, "status_code": 0, "content_type": "", "size": 0,
                    "is_internal": False, "depth": depth,
                    "error": f"File too large: {head['http']['size']} bytes",
                    "redirect_count": 0, "redirects": [], "redirect_chain": [],
                    "x_robots_tag": "", "retry_count": 0, "backoff_total": 0.0,
                    "response_time": 0.0, "response_headers": {},
                }
                result.update(spandoc.extract_page(url, [], self.base_domain))
                result["word_count"] = 0
                return result

        fetch, retry_count, backoff_total = spandoc.retry_fetch(
            url, self.docs, cfg.retries, cfg.delay
        )
        if fetch["error"] is not None:
            result = {
                "url": url, "status_code": 0, "content_type": "", "size": 0,
                "is_internal": False, "depth": depth, "error": fetch["error"],
                "redirect_count": 0, "redirects": [], "redirect_chain": [],
                "x_robots_tag": "", "retry_count": retry_count,
                "backoff_total": backoff_total,
                "response_time": 0.0, "response_headers": {},
            }
            result.update({k: v for k, v in spandoc.extract_page(url, [], self.base_domain).items()})
            result["word_count"] = 0
            return result

        http = fetch["http"]
        result = {
            "url": url,
            "status_code": http["status"],
            "content_type": http["content_type"],
            "size": http["size"],
            "is_internal": U.is_internal(url, self.base_domain),
            "depth": depth,
            "error": None,
            "redirect_count": len(fetch["chain"]) - 1 if fetch["chain"] else 0,
            "redirects": [c["url"] for c in fetch["chain"]],
            "redirect_chain": fetch["chain"],
            "final_url": fetch["final_url"] if fetch["chain"] else None,
            # crawler.py:1031 — X-Robots-Tag from the (final) response headers
            "x_robots_tag": http["xrobots"],
            "retry_count": retry_count,
            "backoff_total": backoff_total,
            # crawler.py:1108 / :1023 — final attempt's summed hop latency
            # + final response's security headers (lowercased)
            "response_time": fetch["rt_total"],
            "response_headers": spandoc.headers_map(http["hdr"]),
        }
        spans = fetch["spans"]
        if "text/html" in http["content_type"]:
            result.update(spandoc.extract_page(url, spans, self.base_domain))
            self._collect_links(url, spans)
            # crawler.py:1092-1100 — extraction gate quirk: subdomain pages
            # only grow the frontier when crawl_external is on
            should_extract = (
                (result["is_internal"] and depth < self.config.max_depth)
                or (self.config.crawl_external and depth < self.config.max_depth)
            )
            if should_extract:
                self._extract_links(url, spans, depth + 1)
        else:
            result.update(spandoc.extract_page(url, [], self.base_domain))
        return result

    # --- sitemap bootstrap (crawler.py:362-381) ---------------------------
    def _parse_sitemap_body(self, body: str | None, depth: int = 1) -> list[str]:
        """Independent transcription of sitemap_parser._parse_sitemap
        (sitemap_parser.py:68-148): nested <sitemap> references recurse
        depth-first (resolved through the sitemap_bodies fetch stand-in)
        BEFORE the document's own <url> entries; bounded at depth 10."""
        import xml.etree.ElementTree as ET

        if depth > 10 or not body:
            return []
        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            return []
        for el in root.iter():
            if "}" in el.tag:
                el.tag = el.tag.split("}")[1]
        out: list[str] = []
        for sm_loc in root.findall(".//sitemap/loc"):
            if sm_loc.text:
                out += self._parse_sitemap_body(
                    self.sitemap_bodies.get(sm_loc.text.strip()), depth + 1
                )
        out += [l.text.strip() for l in root.findall(".//url/loc") if l.text]
        return out

    def _sitemap_locs(self) -> list[str]:
        """Page URLs from the base host's sitemap body, in document order
        (the fixture models discover_sitemaps' fetch)."""
        host = urlparse(self.base_url).netloc
        return self._parse_sitemap_body(self.sitemap_xml_by_host.get(host))

    # --- crawler._crawl_worker at concurrency=1 (crawler.py:757-899) -----
    def run(self, seed_urls: list[str] | None = None) -> dict:
        for u in seed_urls or [self.base_url]:
            self.add_url(u, 0)
        if self.config.discover_sitemaps:
            # crawler.py:372-377: policy-checked, add_url at depth 0 (no
            # trap counting), raw document order
            for u in self._sitemap_locs():
                if self._should_crawl(u):
                    self.add_url(u, 0)
        crawled = 0
        while self.queue and crawled < self.config.max_urls:
            url, depth = self.queue.popleft()
            if depth > self.config.max_depth:
                continue
            self.fetch_order.append((url, depth))
            result = self._crawl_url(url, depth)
            self.pages.append(result)
            crawled += 1

        # post-pass: linked_from + link status patch (crawler.py:861-862,
        # link_manager.py:269-283)
        status_lookup = {p["url"]: p["status_code"] for p in self.pages}
        for link in self.links:
            link["target_status"] = status_lookup.get(link["target_url"])
        for p in self.pages:
            p["linked_from"] = list(self.source_pages.get(p["url"], []))
        return {
            "pages": self.pages,
            "links": self.links,
            "seen": list(self.discovery_order),
            "fetch_order": list(self.fetch_order),
            "traps": list(self.traps.values()),
            "stats": {
                "discovered": len(self.all_discovered),
                "crawled": crawled,
                "pending": len(self.queue),
            },
        }
