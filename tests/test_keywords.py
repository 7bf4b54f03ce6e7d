"""Keyword cannibalization + page-keyword extraction vs pure-Python
transcriptions of the reference (cannibalization.py:150-331, 604-688,
786-860; keyword_analyzer.py:243-412)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from urllib.parse import urlparse

import pytest

from librecrawl_spark.operators.keywords import (
    ANALYZER_STOP_WORDS,
    keyword_cannibalization,
    page_keywords,
)

# ---------------------------------------------------------------- oracle

_SYSTEM = ["/privacy", "/terms", "/policy", "/thank-you",
           "/contact", "/appointment", "/book"]
_PROFILE_P = ["/doctor/", "/dr-", "/dentist/", "/team/", "/our-team/",
              "/meet-", "/about-dr", "/specialist/", "/our-doctors/",
              "/staff/", "/hygienist/", "/orthodontist/"]
_PROFILE_C = ["meet dr", "about dr", "dr. ", "biography",
              "education", "credentials", "experience"]
_BLOG = ["/blog/", "/news/", "/articles/", "/post/", "/insights/",
         "/tips/", "/guide/", "/how-to/", "/learn/", "/education/",
         "/faq/", "/questions/", "/learning-center/"]
_REVIEW = ["/review", "/testimonial", "/case-stud",
           "/patient-stor", "/success-stor"]
_LOCATION = ["/location", "/directions", "/find-us", "/office", "/address"]
_STOP = {"the", "and", "or", "but", "in", "on", "at", "to", "for",
         "of", "with", "by", "from", "an", "as", "is", "was", "are"}


def _ref_page_type(url, title="", h1=""):
    path = urlparse(url).path.lower()
    tl, hl = (title or "").lower(), (h1 or "").lower()
    if path in ["/", "", "/index.html", "/home"]:
        return "Homepage"
    if any(s in path for s in _SYSTEM):
        return "System"
    if any(s in path for s in _PROFILE_P):
        return "Profile"
    if any(s in tl or s in hl for s in _PROFILE_C):
        return "Profile"
    if any(s in path for s in _BLOG):
        return "Blog"
    if re.search(r"/\d{4}/\d{2}/", path):
        return "Blog"
    if any(s in path for s in _REVIEW):
        return "Review"
    if any(s in path for s in _LOCATION):
        return "Location"
    return "Service"


def _ref_filter_keyword(kw):
    words = kw.split()
    if not (2 <= len(words) <= 5):
        return False
    k = kw.lower().strip()
    if len(k) < 3:
        return False
    if k.replace(" ", "").replace("-", "").replace(".", "").isdigit():
        return False
    if k in _STOP:
        return False
    return True


def _ref_primary(kw, title, h1, density, prominence):
    tl, hl = (title or "").lower(), (h1 or "").lower()
    it, ih = kw in tl, kw in hl
    if not (it or ih):
        return False
    return density > 1.5 or prominence > 50 or (it and ih)


def _ref_flag(by_type):
    ns, nb = len(by_type["Service"]), len(by_type["Blog"])
    np_, nr = len(by_type["Profile"]), len(by_type["Review"])
    nh = len(by_type["Homepage"])
    if ns >= 2:
        return True, "high"
    if ns >= 1 and nb >= 1:
        return True, "low"
    if ns >= 1 and (np_ >= 1 or nr >= 1):
        return False, "none"
    if nb >= 2 and ns == 0:
        return True, "medium"
    if nh >= 1 and ns >= 1:
        return False, "none"
    if ns == 0 and nb == 0:
        return False, "none"
    return False, "none"


def _ref_cannibalization(rows):
    """rows: dicts (url, title, h1, keyword, prominence_score, density).
    Returns the reference issue list with the repo's documented
    determinism contract (primary tie -> min url; fixed type order)."""
    kw_pages = defaultdict(list)
    for r in rows:
        kw = r["keyword"].lower().strip()
        if not _ref_filter_keyword(kw):
            continue
        if not _ref_primary(kw, r["title"], r["h1"],
                            r["density"], r["prominence_score"]):
            continue
        kw_pages[kw].append(dict(r, type=_ref_page_type(r["url"], r["title"], r["h1"])))
    issues = []
    for kw, pages in kw_pages.items():
        if len(pages) < 2:
            continue
        by_type = defaultdict(list)
        for p in pages:
            by_type[p["type"]].append(p)
        flag, sev = _ref_flag(by_type)
        if not flag:
            continue
        pages_sorted = sorted(
            pages, key=lambda x: (-x["prominence_score"], -x["density"], x["url"]))
        prim = pages_sorted[0]
        n = len(pages)
        risk = {"high": min(90, 70 + n * 5), "medium": min(70, 40 + n * 5),
                "low": min(50, 20 + n * 5)}[sev]
        order = ["Service", "Blog", "Profile", "Review", "Location",
                 "System", "Homepage"]
        summary = ", ".join(f"{len(by_type[t])} {t}" for t in order if by_type[t])
        rf = []
        if n >= 3:
            rf.append(f"{n} pages competing")
        if sev == "high":
            rf.append("Critical Service vs Service conflict")
        elif sev == "medium":
            rf.append("Multiple Blog posts overlap")
        if sum(1 for p in pages if p["prominence_score"] > 60) >= 2:
            rf.append("Multiple pages highly optimized")
        issues.append({
            "keyword": kw, "search_intent": "Unknown", "severity": sev,
            "risk_score": risk, "page_count": n, "page_types": summary,
            "primary_url": prim["url"], "primary_type": prim["type"],
            "primary_prominence": round(prim["prominence_score"], 2),
            "risk_factors": rf,
        })
    issues.sort(key=lambda x: (-x["risk_score"], x["keyword"]))
    return issues


# ---------------------------------------------------------------- fixture


def _row(url, title, h1, kw, prom, dens):
    return dict(url=url, title=title, h1=h1, keyword=kw,
                prominence_score=float(prom), density=float(dens))


BASE = "https://kw.example"
FIXTURE = [
    # rule 1: two Service pages, same primary keyword -> high
    _row(f"{BASE}/service/implants", "dental implants cost", "dental implants",
         "dental implants", 80, 2.0),
    _row(f"{BASE}/treatment/implants-2", "dental implants guide x",
         "dental implants", "dental implants", 70, 1.0),
    # a third competing page (>=3 -> risk factor) via default-Service path
    _row(f"{BASE}/implants-alt", "dental implants again", "other",
         "dental implants", 65, 0.2),
    # rule 2: Service + Blog -> low
    _row(f"{BASE}/service/whitening", "teeth whitening", "teeth whitening",
         "teeth whitening", 40, 2.5),
    _row(f"{BASE}/blog/whitening-tips", "teeth whitening tips", "tips",
         "teeth whitening", 30, 1.8),
    # rule 3: Service + Profile -> none (suppressed)
    _row(f"{BASE}/service/braces", "clear braces", "clear braces",
         "clear braces", 55, 1.0),
    _row(f"{BASE}/team/dr-smith", "clear braces expert", "clear braces fan",
         "clear braces", 90, 3.0),
    # rule 4: two Blogs, no Service -> medium
    _row(f"{BASE}/blog/floss-a", "daily flossing habits", "daily flossing",
         "daily flossing", 20, 2.0),
    _row(f"{BASE}/news/floss-b", "daily flossing myths", "daily flossing",
         "daily flossing", 20, 1.9),
    # rule 5: Homepage + one Service -> none
    _row(f"{BASE}/", "family dentistry home", "family dentistry",
         "family dentistry", 95, 3.0),
    _row(f"{BASE}/service/family", "family dentistry plans", "family dentistry",
         "family dentistry", 50, 2.0),
    # rule 6: Review + Location only -> none
    _row(f"{BASE}/reviews", "patient stories here", "patient stories",
         "patient stories", 70, 2.0),
    _row(f"{BASE}/location/main", "patient stories map", "patient stories",
         "patient stories", 70, 2.0),
    # primary tie-break: equal prominence+density -> min url wins
    _row(f"{BASE}/service/zzz", "night guards now", "night guards",
         "night guards", 61, 2.0),
    _row(f"{BASE}/service/aaa", "night guards today", "night guards",
         "night guards", 61, 2.0),
    # date-URL blog + /2024/05/ sibling -> rule 4 medium
    _row(f"{BASE}/2024/05/retainers", "retainer care", "retainer care",
         "retainer care", 10, 1.6),
    _row(f"{BASE}/guide/retainers", "retainer care basics", "retainer care",
         "retainer care", 10, 1.6),
    # filtered: single word / 6 words / digits / not-primary
    _row(f"{BASE}/service/x1", "implants", "implants", "implants", 99, 9.9),
    _row(f"{BASE}/service/x2", "implants", "implants", "implants", 99, 9.9),
    _row(f"{BASE}/service/x3", "a b c d e f", "a b c d e f",
         "a b c d e f", 99, 9.9),
    _row(f"{BASE}/service/x4", "a b c d e f", "a b c d e f",
         "a b c d e f", 99, 9.9),
    _row(f"{BASE}/service/x5", "12 34", "12 34", "12 34", 99, 9.9),
    _row(f"{BASE}/service/x6", "12 34", "12 34", "12 34", 99, 9.9),
    _row(f"{BASE}/service/x7", "unrelated title", "unrelated h1",
         "missing phrase", 99, 9.9),
    _row(f"{BASE}/service/x8", "unrelated title", "unrelated h1",
         "missing phrase", 99, 9.9),
    # low density + low prominence + only in title (not h1) -> not primary
    _row(f"{BASE}/service/y1", "weak signal here", "different",
         "weak signal", 10, 0.5),
    _row(f"{BASE}/service/y2", "weak signal there", "different",
         "weak signal", 10, 0.5),
]


@pytest.fixture(scope="module")
def kw_df(spark):
    return spark.createDataFrame(
        FIXTURE,
        schema="url string, title string, h1 string, keyword string, "
               "prominence_score double, density double")


def test_cannibalization_matches_reference_transcription(spark, kw_df):
    got = [r.asDict() for r in keyword_cannibalization(kw_df).collect()]
    want = _ref_cannibalization(FIXTURE)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g["risk_factors"] = list(g["risk_factors"])
        assert g == w, (g, w)
    # the fixture must actually exercise each flagged severity + both caps
    sevs = {w["severity"] for w in want}
    assert sevs == {"high", "low", "medium"}
    kws = {w["keyword"] for w in want}
    assert "dental implants" in kws           # rule 1 (3 pages, factor row)
    assert "night guards" in kws              # tie-break case
    assert "clear braces" not in kws          # rule 3 suppression
    assert "family dentistry" not in kws      # rule 5 suppression
    assert "patient stories" not in kws       # rule 6 suppression
    assert "weak signal" not in kws           # primary gate
    assert "implants" not in kws and "12 34" not in kws


def test_tie_breaks_on_min_url(spark, kw_df):
    row = (keyword_cannibalization(kw_df)
           .filter("keyword = 'night guards'").collect()[0])
    assert row["primary_url"].endswith("/service/aaa")


def test_page_type_branches(spark):
    from librecrawl_spark.operators.keywords import detect_page_type
    import pyspark.sql.functions as F
    cases = [
        ("https://x.example/", "t", "h"),
        ("https://x.example", "t", "h"),
        ("https://x.example/home", "t", "h"),
        ("https://x.example/privacy-policy", "t", "h"),
        ("https://x.example/team/jane", "t", "h"),
        ("https://x.example/page", "meet dr jane", "h"),
        ("https://x.example/page", "t", "her biography"),
        ("https://x.example/blog/post-1", "t", "h"),
        ("https://x.example/2023/11/story", "t", "h"),
        ("https://x.example/testimonials", "t", "h"),
        ("https://x.example/find-us", "t", "h"),
        ("https://x.example/anything-else", "t", "h"),
        ("https://x.example/service/a?q=1#f", "t", "h"),
        ("HTTPS://X.example/REVIEWS", "t", "h"),
    ]
    df = spark.createDataFrame(cases, "url string, title string, h1 string")
    got = [r[0] for r in df.select(
        detect_page_type(F.col("url"), F.col("title"), F.col("h1"))).collect()]
    want = [_ref_page_type(u, t, h) for u, t, h in cases]
    assert got == want


# --------------------------------------------------- page_keywords oracle

_STOPSET = set(ANALYZER_STOP_WORDS)


def _ref_extract_keywords(text, min_length=3, top_n=50, include_phrases=True):
    """keyword_analyzer.py:243-330, verbatim transcription."""
    words = re.findall(r"\b\w+\b", text.lower())
    total_words = len(words)
    if total_words == 0:
        return [], 0
    filtered = [w for w in words
                if w not in _STOPSET and len(w) >= min_length
                and not w.isdigit()]
    word_counts = Counter(filtered)
    phrase_counts = Counter()
    if include_phrases and len(words) > 2:
        for i in range(len(words) - 1):
            if (words[i] not in _STOPSET and words[i + 1] not in _STOPSET
                    and len(words[i]) >= min_length
                    and len(words[i + 1]) >= min_length):
                phrase_counts[f"{words[i]} {words[i+1]}"] += 1
        for i in range(len(words) - 2):
            if (words[i] not in _STOPSET and words[i + 2] not in _STOPSET
                    and len(words[i]) >= min_length
                    and len(words[i + 2]) >= min_length):
                phrase_counts[f"{words[i]} {words[i+1]} {words[i+2]}"] += 1
    all_keywords = []
    for word, count in word_counts.most_common(top_n * 2):
        all_keywords.append({"keyword": word, "frequency": count,
                             "density": round(count / total_words * 100, 2),
                             "type": "word"})
    if include_phrases:
        for phrase, count in phrase_counts.most_common(top_n):
            if count >= 2:
                all_keywords.append(
                    {"keyword": phrase, "frequency": count,
                     "density": round(count / total_words * 100, 2),
                     "type": "phrase"})
    all_keywords.sort(key=lambda x: x["frequency"], reverse=True)
    return all_keywords[:top_n], total_words


def _ref_page_keywords(url, text, title, meta, heads,
                       min_length=3, top_n=50):
    """analyze_title/heading/placement (keyword_analyzer.py:333-412)."""
    kws, _ = _ref_extract_keywords(text, min_length, top_n)
    title_l, meta_l = title.lower(), meta.lower()
    heads_l = heads.lower()
    body = text
    words = body.split()
    first = " ".join(words[:200]).lower() if len(words) > 200 else body.lower()
    last = " ".join(words[-100:]).lower() if len(words) > 100 else body.lower()
    out = []
    for rank, kw in enumerate(kws, 1):
        k = kw["keyword"]
        it, ih = k in title_l, k in heads_l
        ifp, im, ic = k in first, k in meta_l, k in last
        prom = min(100, 30 * it + 25 * ih + 20 * ifp + 15 * im + 10 * ic)
        out.append((url, k, kw["frequency"], kw["density"], kw["type"],
                    it, ih, ifp, im, ic, prom, rank))
    return out


_PK_PAGES = [
    # repeated words + phrases, ties between word and phrase freqs
    ("https://k.example/a",
     "solar panel cost solar panel cost solar panel savings guide "
     "the cost of a solar panel install is high and the install is slow",
     "Solar panel cost guide", "best solar panel cost data",
     "solar install"),
    # stop words, digits, short words filtered; 2-word page quirk
    ("https://k.example/b", "go 42 ab solar", "t", "m", ""),
    ("https://k.example/c", "alpha beta", "alpha", "", ""),   # 2 words: no phrases
    # > 200 words: first-paragraph window engages
    ("https://k.example/d",
     " ".join(f"w{i % 7} filler" for i in range(150)) + " anchor keyword near end",
     "anchor keyword", "", "filler w1"),
    ("https://k.example/e", "", "t", "m", ""),                # empty text: no rows
]


def test_page_keywords_matches_analyzer_transcription(spark):
    df = spark.createDataFrame(
        _PK_PAGES,
        "url string, text string, title string, meta_description string, "
        "headings_text string")
    got = sorted(
        (tuple(r) for r in page_keywords(
            df, headings_text_col="headings_text", top_n=12).collect()),
        key=lambda t: (t[0], t[11]))
    want = []
    for url, text, title, meta, heads in _PK_PAGES:
        want.extend(_ref_page_keywords(url, text, title, meta, heads, top_n=12))
    want.sort(key=lambda t: (t[0], t[11]))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)
    # coverage sanity: phrases present, ties exercised, >200-word page in
    urls = {t[0] for t in want}
    assert "https://k.example/d" in urls
    assert any(t[4] == "phrase" for t in want)
    assert not any(t[0] == "https://k.example/e" for t in want)


def test_page_keywords_feeds_cannibalization(spark):
    """End-to-end §2.10 pipeline: analyzer output drives the
    cannibalization detector's input contract."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("https://k.example/service/x",
          "solar panel cost solar panel cost more",
          "solar panel cost", "solar panel", ""),
         ("https://k.example/treatment/y",
          "solar panel cost solar panel cost less",
          "solar panel cost plans", "solar panel", "")],
        "url string, text string, title string, meta_description string, "
        "headings_text string")
    kws = page_keywords(df, headings_text_col="headings_text", top_n=10)
    rows = (kws.join(df.select("url", "title",
                               F.lit("").alias("h1")), "url")
            .select("url", "title", "h1", "keyword",
                    F.col("prominence_score").cast("double")
                    .alias("prominence_score"), "density"))
    out = keyword_cannibalization(rows)
    hit = out.filter(F.col("keyword") == "solar panel cost").collect()
    assert len(hit) == 1 and hit[0]["severity"] == "high"
