"""Reference-transcription issue oracle: a faithful pure-Python
re-implementation of LibreCrawl's IssueDetector, used as the golden
oracle for the issue-engine equality tests. Every branch, label and
details string is transcribed 1:1 from
/root/reference/src/core/issue_detector.py (citations inline); the
engine (operators/issues.py) must reproduce this oracle's output as a
multiset of (url, type, category, issue, details) rows.

Call pattern mirrors the reference crawler (crawler.py:813):
``detect_issues(result)`` per crawled result in fetch order, then the
whole-crawl detectors once. ``get_issues()`` returns the accumulated
list in emission order.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from fnmatch import fnmatch
from urllib.parse import urlparse

# issue_detector.py:99-107 / :168-175 / :222-229 (identical lists)
_UTILITY_PATTERNS = [
    '/thank-you', '/thankyou', '/confirmation',
    '/privacy-policy', '/privacy', '/terms', '/legal',
    '/cookie-policy', '/gdpr', '/dmca',
    '/login', '/register', '/signup', '/account',
    '/cart', '/checkout', '/wishlist',
    '/search', '/404', '/error',
]

# issue_detector.py:413-420
_ERROR_PATTERNS = [
    'not found', '404', 'page not found', 'error 404',
    "page doesn't exist", 'page does not exist',
    'no longer available', 'has been removed',
    'could not be found', 'cannot be found',
    "doesn't exist", 'does not exist',
    'oops', 'sorry', 'nothing here',
]

# issue_detector.py:321-326
_BOILERPLATE_H2 = {
    'leave a reply', 'comments', 'recent posts', 'related posts',
    'share this post', 'navigate', 'navigation', 'menu',
    'sidebar', 'footer', 'search', 'overview', 'description',
    'reviews', 'categories', 'archives', 'tags', 'meta',
}

# issue_detector.py:1830-1840
_VALID_LANG_CODES = set(
    "aa ab af ak am ar as ay az ba be bg bh bi bn bo br bs ca co cs cy da de "
    "dz el en eo es et eu fa fi fj fo fr fy ga gd gl gn gu ha he hi hr hu hy "
    "ia id ie ik is it iu ja jv ka kk kl km kn ko ks ku ky la lb ln lo lt lv "
    "mg mi mk ml mn mr ms mt my na ne nl no oc om or pa pl ps pt qu rm rn ro "
    "ru rw sa sd sg sh si sk sl sm sn so sq sr ss st su sv sw ta te tg th ti "
    "tk tl tn to tr ts tt tw ug uk ur uz ve vi vo wo xh yi yo za zh zu".split()
) | {"x-default"}

# issue_detector.py:1843
_HREFLANG_RE = re.compile(
    r'^[a-z]{2,3}(-[A-Za-z]{2,4})?(-[A-Za-z]{2})?$|^x-default$', re.IGNORECASE)

# issue_detector.py:1473-1489
_STATUS_MESSAGES = {
    400: 'Bad Request', 401: 'Unauthorized', 403: 'Forbidden',
    404: 'Not Found', 405: 'Method Not Allowed', 406: 'Not Acceptable',
    408: 'Request Timeout', 410: 'Gone', 429: 'Too Many Requests',
    500: 'Internal Server Error', 501: 'Not Implemented', 502: 'Bad Gateway',
    503: 'Service Unavailable', 504: 'Gateway Timeout',
    505: 'HTTP Version Not Supported',
}


def status_code_message(status_code):
    """issue_detector.py:1471-1490."""
    return _STATUS_MESSAGES.get(status_code, f'HTTP {status_code} Error')


def normalize_url_for_comparison(url):
    """issue_detector.py:61-86: lower, drop fragment, rstrip path slashes
    (root becomes scheme://host with NO slash), keep query."""
    if not url:
        return ''
    parsed = urlparse(url.lower())
    path = parsed.path.rstrip('/')
    normalized = f"{parsed.scheme}://{parsed.netloc}{path}"
    if parsed.query:
        normalized += f"?{parsed.query}"
    return normalized


def classify_page_type(url):
    """issue_detector.py:933-1034."""
    if not url:
        return 'other'
    parsed = urlparse(url)
    path = parsed.path.lower()
    archive_patterns = [
        '/author/', '/tag/', '/category/', '/tags/', '/categories/',
        '/page/', '/feed/', '/search/', '/?s=', '/attachment/',
        '/archive/', '/archives/',
    ]
    for pattern in archive_patterns:
        if pattern in path or pattern in url:
            return 'archive'
    if re.search(r'/\d{4}/(\d{2}/)?(\d{2}/)?$', path):
        return 'archive'
    if 'page=' in url or 'paged=' in url:
        return 'archive'
    if path == '/' or path == '':
        return 'important'
    for needle in ('/service', '/services', '/location', '/locations',
                   '-dentist', '/contact', '/about'):
        if needle in path:
            return 'important'
    if re.search(r'/\d{4}/\d{2}/\d{2}/[a-z0-9-]+', path):
        return 'important'
    segments = [s for s in path.split('/') if s]
    if len(segments) == 1 and len(segments[0]) > 3:
        return 'important'
    return 'other'


def _is_archive_or_utility(url):
    """issue_detector.py:94-108 (title check's archive+utility overlay)."""
    if classify_page_type(url) == 'archive':
        return True
    parsed_path = urlparse(url).path.lower()
    return any(p in parsed_path for p in _UTILITY_PATTERNS)


class RefIssueDetector:
    """Transcription of IssueDetector (issue_detector.py:1-1981), minus
    the threading locks (the oracle is sequential)."""

    def __init__(self, exclusion_patterns=()):
        self.exclusion_patterns = list(exclusion_patterns)
        self.detected_issues: list[dict] = []
        self.reported_sitewide_issues: set = set()

    # -- plumbing ---------------------------------------------------------
    def _should_exclude(self, url):
        """issue_detector.py:1457-1469."""
        path = urlparse(url).path
        for pattern in self.exclusion_patterns:
            if '*' in pattern:
                if fnmatch(path, pattern):
                    return True
            elif path == pattern or path.startswith(pattern.rstrip('*')):
                return True
        return False

    def _add(self, url, typ, category, issue, details):
        self.detected_issues.append({
            'url': url, 'type': typ, 'category': category,
            'issue': issue, 'details': details,
        })

    def get_issues(self):
        return list(self.detected_issues)

    # -- per-result entry point (issue_detector.py:19-59) -----------------
    def detect_issues(self, result):
        url = result.get('url', '') or ''
        if self._should_exclude(url):
            return
        status_code = result.get('status_code', 0) or 0
        if status_code == 0:
            # issue_detector.py:30-39 — early return after the failure row
            self._add(url, 'error', 'Technical', 'Connection Failed',
                      result.get('error') or
                      'Failed to connect to server or request blocked')
            return
        self._check_title(result)
        self._check_meta_description(result)
        self._check_headings(result)
        self._check_content(result)
        self._check_technical(result)
        self._check_mobile(result)
        self._check_accessibility(result)
        self._check_social(result)
        self._check_structured_data(result)
        self._check_performance(result)
        self._check_indexability(result)
        self._check_url(result)
        self._check_links(result)
        self._check_security(result)

    # -- titles (issue_detector.py:88-151) --------------------------------
    def _check_title(self, result):
        url = result.get('url', '')
        title = result.get('title') or ''
        arch = _is_archive_or_utility(url)
        if not title:
            severity = 'warning' if arch else 'error'
            issue = ('Missing Title Tag (Archive/Utility)'
                     if severity == 'warning' else 'Missing Title Tag')
            suffix = ' (archive/utility page - lower priority)' if arch else ''
            self._add(url, severity, 'SEO', issue,
                      f"Page has no title tag{suffix}")
        else:
            if len(title) > 60:
                self._add(url, 'warning', 'SEO',
                          'Page Titles: Over 60 Characters',
                          f"Title is {len(title)} characters")
            pixel_width = len(title) * 9
            if pixel_width > 561:
                self._add(url, 'warning', 'SEO', 'Page Titles: Over 561 Pixels',
                          f"Title is approx {pixel_width} pixels")
            if len(title) < 30:
                self._add(url, 'warning', 'SEO', 'Title Too Short',
                          f"Title is {len(title)} characters (recommended: 30-60)")

    # -- meta description (issue_detector.py:153-207) ---------------------
    def _check_meta_description(self, result):
        url = result.get('url', '')
        meta_desc = result.get('meta_description') or ''
        if not meta_desc:
            severity = 'info' if classify_page_type(url) == 'archive' else 'warning'
            parsed_path = urlparse(url).path.lower()
            if any(p in parsed_path for p in _UTILITY_PATTERNS):
                severity = 'info'
            issue = ('Meta Description: Missing (Archive/Utility)'
                     if severity == 'info' else 'Meta Description: Missing')
            suffix = (' (archive/utility page - low priority)'
                      if severity == 'info' else '')
            self._add(url, severity, 'SEO', issue,
                      f"Page has no meta description{suffix}")
        else:
            if len(meta_desc) > 155:
                self._add(url, 'warning', 'SEO',
                          'Meta Description: Over 155 Characters',
                          f"Description is {len(meta_desc)} characters")
            pixel_width = len(meta_desc) * 9
            if pixel_width > 985:
                self._add(url, 'warning', 'SEO',
                          'Meta Description: Over 985 Pixels',
                          f"Description is approx {pixel_width} pixels")

    # -- headings (issue_detector.py:209-351) -----------------------------
    def _check_headings(self, result):
        url = result.get('url', '')
        h1 = result.get('h1') or ''
        h1_list = result.get('h1_list') or []
        headings = result.get('headings_structure') or []
        arch = _is_archive_or_utility(url)

        if not h1 and not h1_list:
            severity = 'warning' if arch else 'error'
            issue = ('Missing H1 Tag (Archive/Utility)'
                     if severity == 'warning' else 'Missing H1 Tag')
            suffix = (' (archive/utility - lower priority)'
                      if severity == 'warning' else '')
            self._add(url, severity, 'SEO', issue,
                      f"Page has no H1 heading{suffix}")
        elif len(h1_list) > 1:
            self._add(url, 'warning', 'SEO', 'H1: Multiple',
                      f'Page has {len(h1_list)} H1 tags')
            if len(set(h1_list)) != len(h1_list):
                self._add(url, 'warning', 'SEO', 'H1: Duplicate',
                          'Page has duplicate H1 tags')

        if h1 and len(h1) > 70:
            self._add(url, 'warning', 'SEO', 'H1: Over 70 Characters',
                      f"H1 is {len(h1)} characters")

        # heading structure (issue_detector.py:273-308)
        last_level = 0
        h2_texts = []
        for h in headings:
            level = h['level'] if isinstance(h, dict) else h.level
            text = h['text'] if isinstance(h, dict) else h.text
            if level > last_level + 1:
                if last_level == 0 and level != 1:
                    severity = 'info' if arch else 'warning'
                    issue = (f'H{level} appears before H1 (Archive/Utility)'
                             if severity == 'info'
                             else f'H{level} appears before H1')
                    self._add(url, severity, 'SEO', issue,
                              f'The first heading is an H{level}, should be H1.')
                elif last_level > 0:
                    self._add(url, 'warning', 'SEO', f'H{level}: Non-Sequential',
                              f'Heading structure skips from H{last_level} to H{level}')
            last_level = level
            if level == 2:
                h2_texts.append(text)

        # duplicate H2 + boilerplate allow-list (issue_detector.py:310-351)
        if len(h2_texts) > 1 and len(set(h2_texts)) != len(h2_texts):
            from collections import Counter
            duplicates = [t for t, c in Counter(h2_texts).items() if c > 1]
            non_boiler = [d for d in duplicates
                          if d.lower().strip() not in _BOILERPLATE_H2]
            if non_boiler:
                severity = 'info' if arch else 'warning'
                issue = ('H2: Duplicate (Archive/Utility)'
                         if severity == 'info' else 'H2: Duplicate')
                suffix = (' (archive/utility - low priority)'
                          if severity == 'info' else '')
                self._add(url, severity, 'SEO', issue,
                          f"Page has duplicate H2 tags: {', '.join(non_boiler)}{suffix}")
            elif duplicates:
                self._add(url, 'info', 'SEO', 'H2: Duplicate (Boilerplate)',
                          f"Duplicate template headings found: {', '.join(duplicates)}")

    # -- content (issue_detector.py:353-366) ------------------------------
    def _check_content(self, result):
        url = result.get('url', '')
        word_count = result.get('word_count', 0) or 0
        if word_count < 300:
            self._add(url, 'warning', 'Content', 'Thin Content',
                      f'Page has only {word_count} words (recommended: ≥300)')

    # -- technical (issue_detector.py:367-595) ----------------------------
    def _check_technical(self, result):
        url = result.get('url', '')
        status_code = result.get('status_code', 0) or 0

        if 400 <= status_code < 500:
            self._add(url, 'error', 'Technical',
                      'Response Codes: External Client Error (4xx)',
                      status_code_message(status_code))
        elif status_code >= 500:
            self._add(url, 'error', 'Technical',
                      'Response Codes: External Server Error (5xx)',
                      status_code_message(status_code))
        elif 300 <= status_code < 400:
            self._add(url, 'info', 'Technical',
                      'Response Codes: Internal Redirection (3xx)',
                      'URL redirects to another location')

        # soft 404 (issue_detector.py:405-451)
        if status_code == 200:
            title = (result.get('title') or '').lower()
            h1 = (result.get('h1') or '').lower()
            is_error_title = any(p in title for p in _ERROR_PATTERNS)
            is_error_h1 = any(p in h1 for p in _ERROR_PATTERNS)
            if is_error_title or is_error_h1:
                if is_error_title and is_error_h1:
                    severity = 'error'
                    details = (f'Title: "{(result.get("title") or "")[:50]}" and '
                               f'H1: "{(result.get("h1") or "")[:50]}" suggest error page')
                elif is_error_title:
                    severity = 'warning'
                    details = (f'Title "{(result.get("title") or "")[:60]}" '
                               'suggests this is an error page')
                else:
                    severity = 'warning'
                    details = (f'H1 "{(result.get("h1") or "")[:60]}" '
                               'suggests this is an error page')
                self._add(url, severity, 'Technical',
                          'Soft 404: Returns 200 but appears broken', details)

        # redirect chain (issue_detector.py:453-505)
        redirect_chain = result.get('redirect_chain') or []
        chain = [c if isinstance(c, dict) else c.asDict() for c in redirect_chain]
        redirect_count = ((result.get('redirect_count', 0) or
                           len(chain) - 1) if chain else 0)
        if redirect_count > 0:
            seen, has_loop, loop_url = set(), False, None
            for c in chain:
                cu = c.get('url', '')
                n = normalize_url_for_comparison(cu)
                if n in seen:
                    has_loop, loop_url = True, cu
                    break
                seen.add(n)
            if has_loop:
                self._add(url, 'error', 'Technical', 'Redirect Loop Detected',
                          f'URL redirects back to itself: {loop_url}')
            elif redirect_count > 3:
                summary = ' → '.join(
                    f"{c.get('status_code') if c.get('status_code') is not None else '?'}"
                    for c in chain)
                self._add(url, 'warning', 'Technical', 'Long Redirect Chain',
                          f'{redirect_count} redirects before final destination. '
                          f'Chain: {summary}')
            elif redirect_count > 1:
                summary = ' → '.join(
                    f"{c.get('status_code') if c.get('status_code') is not None else '?'}"
                    for c in chain)
                self._add(url, 'info', 'Technical', 'Redirect Chain',
                          f'{redirect_count} redirects: {summary}')

        # canonical (issue_detector.py:507-591)
        canonical_url = result.get('canonical_url') or ''
        robots_meta = (result.get('robots') or '').lower()
        x_robots_tag = (result.get('x_robots_tag') or '').lower()
        is_noindex = 'noindex' in robots_meta or 'noindex' in x_robots_tag
        if not canonical_url:
            if not is_noindex:
                page_type = classify_page_type(url)
                if page_type == 'important':
                    self._add(url, 'error', 'Technical', 'Missing Canonical URL',
                              'Indexable content page has no canonical URL')
                elif page_type == 'archive':
                    self._add(url, 'warning', 'Technical', 'Missing Canonical URL',
                              'Archive page missing canonical '
                              '(Review if this should be indexed)')
                else:
                    self._add(url, 'error', 'Technical', 'Missing Canonical URL',
                              'Page has no canonical URL specified')
        else:
            if (normalize_url_for_comparison(canonical_url)
                    != normalize_url_for_comparison(url)):
                severity = 'warning'
                details = f"Page is canonicalised to: {canonical_url}"
                p_url, p_can = urlparse(url), urlparse(canonical_url)
                if p_can.path in ['', '/'] and p_url.path not in ['', '/']:
                    severity = 'error'
                    details = ('Critical: Content page canonicalises to '
                               'Homepage (Soft 404 risk)')
                elif '__trashed' in canonical_url:
                    severity = 'error'
                    details = 'Critical: Canonical points to a trashed post URL'
                elif (p_url.scheme == p_can.scheme
                      and p_url.netloc == p_can.netloc
                      and p_url.path == p_can.path):
                    severity = 'info'
                    details = 'Safe: Canonical removes query parameters or fragments'
                elif (p_url.netloc == p_can.netloc
                      and p_url.path.strip('/') == p_can.path.strip('/')):
                    severity = 'info'
                    details = 'Safe: Canonical normalizes slash or protocol'
                self._add(url, severity, 'Technical',
                          'Canonicals: Canonicalised', details)

    # -- mobile (issue_detector.py:597-608) -------------------------------
    def _check_mobile(self, result):
        if not result.get('viewport'):
            self._add(result.get('url', ''), 'error', 'Mobile',
                      'Missing Viewport Meta Tag', 'Page is not mobile-optimized')

    # -- accessibility / images (issue_detector.py:610-651) ---------------
    def _check_accessibility(self, result):
        url = result.get('url', '')
        if not result.get('lang'):
            self._add(url, 'info', 'Accessibility', 'Missing Language Attribute',
                      'Template issue: HTML tag missing lang attribute '
                      '(accessibility best practice)')
        images = result.get('images') or []
        imgs = [i if isinstance(i, dict) else i.asDict() for i in images]
        missing_alt = sum(1 for i in imgs if not i.get('alt'))
        missing_size = sum(1 for i in imgs
                           if not i.get('width') or not i.get('height'))
        if missing_alt > 0:
            self._add(url, 'warning', 'Images', 'Images: Missing Alt Text',
                      f'{missing_alt} images lack alt text')
        if missing_size > 0:
            self._add(url, 'info', 'Images', 'Images: Missing Size Attributes',
                      f'{missing_size} images lack width/height attributes')

    # -- social (issue_detector.py:653-673) -------------------------------
    def _check_social(self, result):
        url = result.get('url', '')
        if not result.get('og_tags'):
            self._add(url, 'info', 'Social', 'Missing OpenGraph Tags',
                      'Page has no OpenGraph tags for social sharing')
        if not result.get('twitter_tags'):
            self._add(url, 'info', 'Social', 'Missing Twitter Card Tags',
                      'Page has no Twitter Card tags')

    # -- structured data (issue_detector.py:675-847) ----------------------
    # The oracle consumes the engine's precomputed schema-analysis columns
    # (schema_types / faq_count / has_organization / has_website /
    # article_fields_ok), which transcribe the recursive @type walk at
    # extraction time (functions/spandoc.py). The check logic below is the
    # reference's.
    def _check_structured_data(self, result):
        url = result.get('url', '')
        json_ld = result.get('json_ld') or []
        schema_org = result.get('schema_org') or []
        if not json_ld and not schema_org:
            self._add(url, 'warning', 'Structured Data', 'No Structured Data',
                      'Page has no JSON-LD or Schema.org markup')
            return
        detected = set(result.get('schema_types') or [])
        has_org = bool(result.get('has_organization'))
        has_web = bool(result.get('has_website'))
        if (classify_page_type(url) == 'important' and not has_org
                and not has_web and 'Article' not in detected
                and 'BlogPosting' not in detected and 'Product' not in detected):
            self._add(url, 'info', 'Structured Data',
                      'Schema: Missing Organization/WebSite',
                      'Consider adding Organization or WebSite schema '
                      'for brand visibility')
        if 'FAQPage' in detected:
            faq_count = result.get('faq_count', 0) or 0
            if faq_count == 0:
                self._add(url, 'warning', 'Structured Data',
                          'Schema: FAQPage has no questions',
                          'FAQPage schema found but no Question items detected')
            elif faq_count < 3:
                self._add(url, 'info', 'Structured Data',
                          'Schema: FAQPage has few questions',
                          f'Only {faq_count} FAQ items found (3+ recommended)')
        if ('Article' in detected or 'BlogPosting' in detected
                or 'NewsArticle' in detected):
            if not result.get('article_fields_ok'):
                self._add(url, 'warning', 'Structured Data',
                          'Schema: Article missing required fields',
                          'Article schema should have headline and datePublished')

    # -- performance (issue_detector.py:849-871) --------------------------
    def _check_performance(self, result):
        url = result.get('url', '')
        response_time = result.get('response_time', 0) or 0
        page_size = result.get('size', 0) or 0
        if response_time > 3000:
            self._add(url, 'error', 'Performance', 'Slow Response Time',
                      f'Page took {response_time}ms to respond '
                      '(recommended: <3000ms)')
        if page_size > 3 * 1024 * 1024:
            self._add(url, 'error', 'Performance', 'Large Page Size',
                      f'Page size is {page_size / 1024 / 1024:.1f}MB '
                      '(recommended: <3MB)')

    # -- indexability (issue_detector.py:873-931) -------------------------
    def _check_indexability(self, result):
        url = result.get('url', '')
        robots_meta = (result.get('robots') or '').lower()
        x_robots_tag = (result.get('x_robots_tag') or '').lower()
        meta_noindex = 'noindex' in robots_meta
        header_noindex = 'noindex' in x_robots_tag
        if meta_noindex or header_noindex:
            sources = []
            if meta_noindex:
                sources.append("HTML Meta Tag")
            if header_noindex:
                sources.append("HTTP Header (X-Robots-Tag)")
            source_str = " & ".join(sources)
            page_type = classify_page_type(url)
            if page_type == 'archive':
                self._add(url, 'info', 'Indexability', 'Directives: Noindex',
                          f'Source: {source_str} (Expected for archive page)')
            elif page_type == 'important':
                self._add(url, 'error', 'Indexability', 'Directives: Noindex',
                          f'Source: {source_str} (Critical: Important page is blocked!)')
            else:
                self._add(url, 'warning', 'Indexability', 'Directives: Noindex',
                          f'Source: {source_str}')
        meta_nofollow = 'nofollow' in robots_meta
        header_nofollow = 'nofollow' in x_robots_tag
        if meta_nofollow or header_nofollow:
            sources = []
            if meta_nofollow:
                sources.append("HTML Meta Tag")
            if header_nofollow:
                sources.append("HTTP Header (X-Robots-Tag)")
            self._add(url, 'warning', 'Indexability', 'Directives: Nofollow',
                      f'Source: {" & ".join(sources)}')

    # -- URL structure (issue_detector.py:1037-1079) ----------------------
    def _check_url(self, result):
        url = result.get('url', '')
        path = urlparse(url).path
        if len(url) > 115:
            self._add(url, 'info', 'URL', 'URL: Over 115 Characters',
                      f'URL is {len(url)} characters long')
        if '_' in path:
            self._add(url, 'info', 'URL', 'URL: Underscores',
                      'URL contains underscores (use hyphens instead)')
        if '?' in url:
            self._add(url, 'info', 'URL', 'URL: Parameters',
                      'URL contains query parameters')
        parts = [p for p in path.split('/') if p]
        if len(parts) != len(set(parts)):
            self._add(url, 'info', 'URL', 'URL: Repetitive Path',
                      'URL path contains duplicate segments')

    # -- links (issue_detector.py:1081-1184) ------------------------------
    def _check_links(self, result):
        url = result.get('url', '')
        links_data = [l if isinstance(l, dict) else l.asDict()
                      for l in (result.get('links_data') or [])]
        external_links_count = result.get('external_links', 0) or 0
        if external_links_count > 50:
            self._add(url, 'info', 'Links',
                      'Links: Pages With High External Outlinks',
                      f'Page has {external_links_count} external links')
        generic = ['click here', 'read more', 'more', 'here', 'link', 'this', 'go']
        n_nofollow = n_empty = n_generic = n_unsafe = 0
        for link in links_data:
            text = (link.get('text') or '').lower().strip()
            rel = link.get('rel') or []
            if isinstance(rel, str):
                rel = [rel]
            rel = list(rel)
            target = link.get('target') or ''
            is_internal = bool(link.get('is_internal'))
            if is_internal and 'nofollow' in rel:
                n_nofollow += 1
            if not text and not link.get('aria-label'):
                n_empty += 1
            if is_internal and text in generic:
                n_generic += 1
            if (target == '_blank' and not is_internal
                    and 'noopener' not in rel and 'noreferrer' not in rel):
                n_unsafe += 1
        if n_nofollow > 0:
            self._add(url, 'info', 'Links', 'Links: Internal Nofollow Outlinks',
                      f'{n_nofollow} internal links are marked nofollow')
        if n_empty > 0:
            self._add(url, 'warning', 'Links',
                      'Links: Internal Outlinks With No Anchor Text',
                      f'{n_empty} links have no anchor text')
        if n_generic > 0:
            self._add(url, 'warning', 'Links', 'Links: Non-Descriptive Anchor Text',
                      f'{n_generic} links use generic text like "click here"')
        if n_unsafe > 0:
            # site-wide once-per-external-domain (issue_detector.py:1154-1184)
            unsafe_domains = set()
            for link in links_data:
                rel = link.get('rel') or []
                if isinstance(rel, str):
                    rel = [rel]
                rel = list(rel)
                if (link.get('target') == '_blank'
                        and not link.get('is_internal')
                        and 'noopener' not in rel and 'noreferrer' not in rel):
                    domain = urlparse(link.get('href') or '').netloc
                    if domain:
                        unsafe_domains.add(domain)
            for domain in unsafe_domains:
                key = (domain, 'unsafe_cross_origin')
                if key not in self.reported_sitewide_issues:
                    self.reported_sitewide_issues.add(key)
                    self._add(url, 'info', 'Security',
                              'Security: Unsafe Cross-Origin Links',
                              f'External domain {domain} opens in new tab without '
                              'rel="noopener" (Best practice recommendation)')

    # -- security (issue_detector.py:1186-1297) ---------------------------
    def _check_security(self, result):
        url = result.get('url', '')
        headers = {k.lower(): v for k, v in (result.get('response_headers') or {}).items()}
        links_data = [l if isinstance(l, dict) else l.asDict()
                      for l in (result.get('links_data') or [])]
        images = [i if isinstance(i, dict) else i.asDict()
                  for i in (result.get('images') or [])]
        domain = urlparse(url).netloc
        scheme = urlparse(url).scheme
        for hdr, key, typ, issue, details in (
            ('content-security-policy', 'missing_csp', 'info',
             'Security: Missing Content-Security-Policy',
             'Server does not send Content-Security-Policy header. '
             'This is a site-wide configuration issue.'),
            ('strict-transport-security', 'missing_hsts', 'warning',
             'Security: Missing HSTS Header',
             'HTTP Strict Transport Security (HSTS) is not enabled. '
             'Users effectively can be downgraded to HTTP.'),
            ('x-frame-options', 'missing_xfo', 'info',
             'Security: Missing X-Frame-Options',
             'Missing X-Frame-Options header can leave the site vulnerable '
             'to Clickjacking.'),
        ):
            if key == 'missing_hsts' and not url.startswith('https://'):
                continue
            if hdr not in headers:
                k = (domain, key)
                if k not in self.reported_sitewide_issues:
                    self.reported_sitewide_issues.add(k)
                    self._add(f'{scheme}://{domain}', typ, 'Security', issue, details)

        # mixed content + protocol-relative (issue_detector.py:1250-1297)
        if url.startswith('https://'):
            mixed = [f"Image: {i.get('src', '')}" for i in images
                     if (i.get('src') or '').startswith('http://')]
            proto_rel = sum(1 for i in images
                            if (i.get('src') or '').startswith('//'))
            proto_rel += sum(1 for l in links_data
                             if (l.get('href') or '').startswith('//'))
            if mixed:
                details_str = ', '.join(mixed[:5])
                if len(mixed) > 5:
                    details_str += f', and {len(mixed) - 5} more'
                self._add(url, 'error', 'Security', 'Security: Mixed Content',
                          f'Secure page loads insecure (HTTP) assets: {details_str}')
            if proto_rel > 0:
                self._add(url, 'warning', 'Security',
                          'Security: Protocol-Relative Resource Links',
                          f'{proto_rel} resources use protocol-relative URLs (//). '
                          'Use explicit HTTPS instead.')

    # -- whole-crawl detectors -------------------------------------------

    def detect_sitemap_issues(self, sitemap_urls, all_results):
        """issue_detector.py:1492-1626."""
        empty = {'total': 0, 'valid': 0, 'errors': 0, 'noindex': 0,
                 'non_canonical': 0, 'redirects': 0, 'not_crawled': 0,
                 'issues': []}
        if not sitemap_urls or not all_results:
            return empty
        lookup = {}
        for result in all_results:
            u = result.get('url', '')
            if u:
                lookup[normalize_url_for_comparison(u)] = result
        counts = dict(valid=0, errors=0, noindex=0, non_canonical=0,
                      redirects=0, not_crawled=0)
        issues = []
        for sitemap_url in sitemap_urls:
            norm = normalize_url_for_comparison(sitemap_url)
            result = lookup.get(norm)
            if not result:
                counts['not_crawled'] += 1
                continue
            status = result.get('status_code', 0) or 0
            robots_meta = (result.get('robots') or '').lower()
            x_robots = (result.get('x_robots_tag') or '').lower()
            canonical = result.get('canonical_url') or ''
            is_noindex = 'noindex' in robots_meta or 'noindex' in x_robots
            is_non_canonical = bool(
                canonical and normalize_url_for_comparison(canonical) != norm)
            if status >= 400 or status == 0:
                counts['errors'] += 1
                issues.append({
                    'url': sitemap_url, 'type': 'error', 'category': 'Sitemap',
                    'issue': 'Sitemap: Broken URL',
                    'details': f'URL returns {status_code_message(status)} '
                               f'(Status {status})'})
            elif 300 <= status < 400:
                counts['redirects'] += 1
                issues.append({
                    'url': sitemap_url, 'type': 'warning', 'category': 'Sitemap',
                    'issue': 'Sitemap: Redirecting URL',
                    'details': f'URL redirects ({status}) - update sitemap '
                               'with final destination'})
            elif is_noindex:
                counts['noindex'] += 1
                issues.append({
                    'url': sitemap_url, 'type': 'warning', 'category': 'Sitemap',
                    'issue': 'Sitemap: Noindexed URL',
                    'details': 'URL has noindex directive - remove from sitemap '
                               'or remove noindex'})
            elif is_non_canonical:
                counts['non_canonical'] += 1
                issues.append({
                    'url': sitemap_url, 'type': 'warning', 'category': 'Sitemap',
                    'issue': 'Sitemap: Non-Canonical URL',
                    'details': f'URL canonicalises to {canonical} - update '
                               'sitemap with canonical URL'})
            else:
                counts['valid'] += 1
        self.detected_issues.extend(issues)
        return {'total': len(sitemap_urls), **counts, 'issues': issues}

    def detect_links_to_redirects(self, all_results, all_links):
        """issue_detector.py:1628-1718."""
        if not all_results or not all_links:
            return
        status_map = {}
        for result in all_results:
            u = result.get('url', '')
            if u:
                status_map[normalize_url_for_comparison(u)] = (
                    result.get('status_code', 0) or 0)
        by_source: dict[str, list] = {}
        for link in all_links:
            source = link.get('source_url', '')
            target = link.get('target_url', '')
            if not source or not target or not link.get('is_internal'):
                continue
            status = status_map.get(normalize_url_for_comparison(target))
            if status is not None and 300 <= status < 400:
                by_source.setdefault(source, []).append((target, status))
        for source, source_links in by_source.items():
            count = len(source_links)
            examples = [f"{t} ({s})" for t, s in source_links[:3]]
            examples_str = ', '.join(examples)
            if count > 3:
                examples_str += f', and {count - 3} more'
            self._add(source, 'warning', 'Links',
                      'Links: Internal Links to Redirects',
                      f'{count} internal links point to redirecting URLs: '
                      f'{examples_str}')

    def detect_broken_link_sources(self, all_results, all_links):
        """issue_detector.py:1720-1815."""
        if not all_results or not all_links:
            return
        status_map = {}
        for result in all_results:
            u = result.get('url', '')
            if u:
                status_map[normalize_url_for_comparison(u)] = {
                    'status_code': result.get('status_code', 0) or 0, 'url': u}
        target_sources: dict[str, list[str]] = {}
        for link in all_links:
            source = link.get('source_url', '')
            target = link.get('target_url', '')
            if not source or not target:
                continue
            target_sources.setdefault(
                normalize_url_for_comparison(target), []).append(source)
        for norm, info in status_map.items():
            status = info['status_code']
            if status >= 400 or status == 0:
                sources = target_sources.get(norm, [])
                count = len(sources)
                if count > 0:
                    source_list = ', '.join(sources[:5])
                    if count > 5:
                        source_list += f' and {count - 5} more'
                    self._add(info['url'],
                              'error' if status >= 400 else 'warning', 'Links',
                              f'Broken Link Sources: {status} error linked '
                              f'from {count} pages',
                              f'This broken URL is linked from: {source_list}')

    def detect_hreflang_issues(self, all_results):
        """issue_detector.py:1817-1969."""
        url_hreflang_map, url_status_map = {}, {}
        for result in all_results:
            u = result.get('url', '')
            if not u:
                continue
            norm = normalize_url_for_comparison(u)
            url_status_map[norm] = result.get('status_code', 0) or 0
            hl = [h if isinstance(h, dict) else h.asDict()
                  for h in (result.get('hreflang') or [])]
            if hl:
                url_hreflang_map[norm] = {'original_url': u, 'hreflangs': hl}
        for norm, data in url_hreflang_map.items():
            source_url = data['original_url']
            has_self = False
            for entry in data['hreflangs']:
                lang = entry.get('lang') or ''
                target_url = entry.get('url') or ''
                if not lang or not target_url:
                    continue
                norm_target = normalize_url_for_comparison(target_url)
                lang_base = lang.split('-')[0].lower()
                if not _HREFLANG_RE.match(lang):
                    self._add(source_url, 'warning', 'International',
                              'Hreflang: Invalid Language Code',
                              f'Invalid hreflang code "{lang}" - should be '
                              'ISO 639-1 format (e.g., en, en-US)')
                elif (lang_base not in _VALID_LANG_CODES
                      and lang.lower() != 'x-default'):
                    self._add(source_url, 'warning', 'International',
                              'Hreflang: Unknown Language Code',
                              f'Unrecognized language code "{lang}" - verify '
                              'it is a valid ISO 639-1 code')
                if norm_target == norm:
                    has_self = True
                if norm_target in url_hreflang_map:
                    points_back = any(
                        normalize_url_for_comparison(h.get('url') or '') == norm
                        for h in url_hreflang_map[norm_target]['hreflangs'])
                    if not points_back:
                        self._add(source_url, 'warning', 'International',
                                  'Hreflang: Missing Reciprocal Link',
                                  f'Page points to {target_url} ({lang}) but '
                                  'target does not point back')
                target_status = url_status_map.get(norm_target, 0)
                if target_status >= 400 or target_status == 0:
                    self._add(source_url, 'error', 'International',
                              'Hreflang: Points to Non-200 Page',
                              f'Hreflang ({lang}) points to {target_url} which '
                              f'returns status {target_status}')
            if data['hreflangs'] and not has_self:
                self._add(source_url, 'info', 'International',
                          'Hreflang: Missing Self-Reference',
                          'Page has hreflang tags but no self-referencing hreflang')

    def detect_duplication_issues(self, all_results, similarity_threshold=0.85):
        """issue_detector.py:1299-1431."""
        data = [{
            'url': r.get('url', ''),
            'title': (r.get('title') or '').lower().strip(),
            'desc': (r.get('meta_description') or '').lower().strip(),
            'h1': (r.get('h1') or '').lower().strip(),
            'word_count': r.get('word_count', 0) or 0,
        } for r in all_results]
        w = {'title': 0.35, 'desc': 0.35, 'h1': 0.20, 'word_count': 0.10}
        for i in range(len(data)):
            d1 = data[i]
            if self._should_exclude(d1['url']):
                continue
            for j in range(i + 1, len(data)):
                d2 = data[j]
                if self._should_exclude(d2['url']):
                    continue
                if d1['word_count'] and d2['word_count']:
                    wc_sim = (min(d1['word_count'], d2['word_count'])
                              / max(d1['word_count'], d2['word_count']))
                else:
                    wc_sim = 0
                score = wc_sim * w['word_count']
                max_pot = 1.0 - w['word_count'] + score
                if max_pot < similarity_threshold:
                    continue
                t_sim = (SequenceMatcher(None, d1['title'], d2['title']).ratio()
                         if d1['title'] and d2['title'] else 0)
                score += t_sim * w['title']
                max_pot = max_pot - w['title'] + t_sim * w['title']
                if max_pot < similarity_threshold:
                    continue
                de_sim = (SequenceMatcher(None, d1['desc'], d2['desc']).ratio()
                          if d1['desc'] and d2['desc'] else 0)
                score += de_sim * w['desc']
                max_pot = max_pot - w['desc'] + de_sim * w['desc']
                if max_pot < similarity_threshold:
                    continue
                h_sim = (SequenceMatcher(None, d1['h1'], d2['h1']).ratio()
                         if d1['h1'] and d2['h1'] else 0)
                score += h_sim * w['h1']
                if score >= similarity_threshold:
                    self._add(d1['url'], 'warning', 'Duplication',
                              'Duplicate Content Detected',
                              f'Content is {score*100:.1f}% similar to {d2["url"]}')
                    self._add(d2['url'], 'warning', 'Duplication',
                              'Duplicate Content Detected',
                              f'Content is {score*100:.1f}% similar to {d1["url"]}')
