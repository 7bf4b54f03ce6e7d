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

from pyspark.sql import Column, DataFrame, Window, functions as F

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

# keyword_analyzer.py:22-74 — the analyzer's stop-word spec constants,
# verbatim (English + Hindi).
ANALYZER_STOP_WORDS = [
    "a", "an", "the",
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being", "have",
    "has", "had", "having", "do", "does", "did", "doing", "would",
    "should", "could", "ought", "will", "shall", "can", "may", "might",
    "must",
    "about", "above", "across", "after", "against", "along", "among",
    "around", "at", "before", "behind", "below", "beneath", "beside",
    "between", "beyond", "by", "down", "during", "except", "for",
    "from", "in", "inside", "into", "like", "near", "of", "off", "on",
    "onto", "out", "outside", "over", "past", "since", "through",
    "throughout", "till", "to", "toward", "under", "underneath",
    "until", "up", "upon", "with", "within", "without",
    "and", "but", "or", "nor", "yet", "so", "although", "because",
    "unless", "while", "if", "then", "else", "when", "where", "why",
    "how", "than", "whether", "either", "neither", "both", "each",
    "few", "more", "most", "other", "some", "such", "no", "not",
    "only", "same", "as", "also", "just", "even", "still", "already",
    "always", "never",
    "all", "any", "every", "here", "there", "very", "too", "well",
    "now", "get", "got", "go", "goes", "going", "gone", "come",
    "comes", "coming", "came", "make", "made", "take", "took", "taken",
    "give", "gave", "given", "know", "knew", "known", "think",
    "thought", "see", "saw", "seen", "want", "wanted", "use", "used",
    "using", "find", "found", "say", "said", "let", "put", "keep",
    "kept", "tell", "told", "ask", "asked", "try", "tried", "need",
    "needed", "feel", "felt", "become", "became", "leave", "left",
    "call", "called", "first", "last", "long", "great", "little",
    "own", "old", "right", "big", "high", "different", "small",
    "large", "next", "early", "young", "important", "public", "bad",
    "new", "good",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten",
    "click", "read", "learn", "view", "share", "follow", "comment",
    "subscribe", "menu", "home", "page", "site", "website", "link",
    "links", "copyright", "privacy", "policy", "terms", "conditions",
    "contact", "us",
    "का", "की", "के", "है", "हैं", "था", "थी", "थे", "को", "से", "में",
    "पर", "और", "या", "एक", "यह", "वह", "इस", "उस", "जो", "कि", "लिए",
    "साथ", "अपने", "होता", "होती", "होते", "करना", "करता", "करती",
    "करते",
]

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


def page_keywords(pages: DataFrame, text_col: str = "text",
                  title_col: str = "title",
                  meta_col: str = "meta_description",
                  headings_text_col: str | None = None,
                  min_length: int = 3, top_n: int = 50,
                  include_phrases: bool = True) -> DataFrame:
    """Per-page keyword extraction + prominence scoring
    (keyword_analyzer.py:243-412) — the producer of
    keyword_cannibalization's input rows, completing the §2.10 keyword
    pipeline on-engine.

    Transcribed semantics, including the reference's tie orders (which
    all reduce to deterministic sort keys because Counter iteration is
    insertion order and both most_common/heapq.nlargest and list.sort
    are stable):
      - words  = ``\\w+`` runs of lower(text); total = len(words)
      - singles: not stop / len >= min_length / not digits; cut to the
        top 2*top_n per page by (freq DESC, first-occurrence ASC)
      - phrases (only when the page has > 2 words): 2-grams where both
        words pass stop+length (NO digit check — reference quirk) and
        3-grams where the FIRST and LAST words pass (middle unchecked),
        counted in ONE counter; cut to top_n by (freq DESC, 2-gram
        before 3-gram, first-occurrence ASC), THEN freq >= 2 (the
        reference filters after the cut, so count-1 phrases inside the
        top_n are dropped, not replaced)
      - final page rank: stable sort by freq DESC over
        [singles..., phrases...] == (freq DESC, word before phrase,
        2-gram before 3-gram, first-occurrence ASC); keep top_n
      - placement: first paragraph = first 200 whitespace-split words
        (the WHOLE text when <= 200 — reference quirk), conclusion =
        last 100 (whole text when <= 100); in_title/in_headings/in_meta
        by substring containment
      - prominence = 30*title + 25*headings + 20*first-para + 15*meta
        + 10*conclusion, capped at 100

    Documented engine divergences: density rounds HALF_UP (Spark
    round) where Python's round() is banker's — differs only on exact
    .xx5 boundaries; the digit filter is ASCII ``^[0-9]+$`` where
    str.isdigit also covers non-ASCII digits.

    Plan shape: posexplode -> hash aggregate on (url, keyword) +
    per-url lead/rank windows (per-document bounded, no global sort)
    -> broadcast-free join back on url. One explode, ~3 exchanges.
    """
    words = F.expr(f"regexp_extract_all(lower({text_col}), '\\\\w+', 0)")
    heads = (F.lower(F.coalesce(F.col(headings_text_col), F.lit("")))
             if headings_text_col else F.lit(""))
    base = (
        pages.select(
            "url",
            F.lower(F.coalesce(F.col(title_col), F.lit(""))).alias("_title"),
            F.lower(F.coalesce(F.col(meta_col), F.lit(""))).alias("_meta"),
            heads.alias("_heads"),
            F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_body"),
            words.alias("_w"),
        )
        .withColumn("_total", F.size("_w"))
        .filter(F.col("_total") > 0)
    )

    tok = base.select("url", "_total", F.posexplode("_w").alias("_pos", "_kw"))

    def _passes(c):
        return (~c.isin(ANALYZER_STOP_WORDS)) & (F.length(c) >= min_length)

    singles = (
        tok.filter(_passes(F.col("_kw")) & ~F.col("_kw").rlike("^[0-9]+$"))
        .groupBy("url", "_kw")
        .agg(F.count("*").alias("_freq"), F.min("_pos").alias("_fp"),
             F.first("_total").alias("_total"))
    )
    w_s = Window.partitionBy("url").orderBy(F.desc("_freq"), F.asc("_fp"))
    singles = (singles.withColumn("_r", F.row_number().over(w_s))
               .filter(F.col("_r") <= top_n * 2).drop("_r")
               .withColumn("_blk", F.lit(0)).withColumn("_is3", F.lit(0)))

    allk = singles
    if include_phrases:
        w_seq = Window.partitionBy("url").orderBy("_pos")
        t2 = (tok.withColumn("_w1", F.lead("_kw", 1).over(w_seq))
              .withColumn("_w2", F.lead("_kw", 2).over(w_seq))
              .filter(F.col("_total") > 2))
        p2 = (t2.filter(F.col("_w1").isNotNull()
                        & _passes(F.col("_kw")) & _passes(F.col("_w1")))
              .select("url", "_total", F.lit(0).alias("_is3"),
                      F.concat_ws(" ", "_kw", "_w1").alias("_kw2"), "_pos"))
        p3 = (t2.filter(F.col("_w2").isNotNull()
                        & _passes(F.col("_kw")) & _passes(F.col("_w2")))
              .select("url", "_total", F.lit(1).alias("_is3"),
                      F.concat_ws(" ", "_kw", "_w1", "_w2").alias("_kw2"),
                      "_pos"))
        phrases = (
            p2.unionByName(p3)
            .groupBy("url", F.col("_kw2").alias("_kw"))
            .agg(F.count("*").alias("_freq"), F.min("_pos").alias("_fp"),
                 F.first("_total").alias("_total"), F.first("_is3").alias("_is3"))
        )
        w_p = Window.partitionBy("url").orderBy(
            F.desc("_freq"), F.asc("_is3"), F.asc("_fp"))
        phrases = (phrases.withColumn("_r", F.row_number().over(w_p))
                   .filter((F.col("_r") <= top_n) & (F.col("_freq") >= 2))
                   .drop("_r").withColumn("_blk", F.lit(1)))
        allk = singles.unionByName(phrases.select(*singles.columns))

    w_f = Window.partitionBy("url").orderBy(
        F.desc("_freq"), F.asc("_blk"), F.asc("_is3"), F.asc("_fp"))
    ranked = (allk.withColumn("rank", F.row_number().over(w_f))
              .filter(F.col("rank") <= top_n))

    ws = F.filter(F.split(F.col("_body"), r"\s+"), lambda x: x != F.lit(""))
    scalars = base.select(
        "url", "_title", "_meta", "_heads",
        F.when(F.size(ws) > 200,
               F.concat_ws(" ", F.slice(ws, 1, 200)))
        .otherwise(F.col("_body")).alias("_first"),
        F.when(F.size(ws) > 100,
               F.concat_ws(" ", F.slice(ws, -100, 100)))
        .otherwise(F.col("_body")).alias("_last"),
    )
    j = ranked.join(scalars, "url")
    in_title = F.col("_title").contains(F.col("_kw"))
    in_heads = F.col("_heads").contains(F.col("_kw"))
    in_first = F.col("_first").contains(F.col("_kw"))
    in_meta = F.col("_meta").contains(F.col("_kw"))
    in_concl = F.col("_last").contains(F.col("_kw"))
    prom = F.least(
        F.lit(100),
        in_title.cast("int") * 30 + in_heads.cast("int") * 25
        + in_first.cast("int") * 20 + in_meta.cast("int") * 15
        + in_concl.cast("int") * 10)
    return j.select(
        "url",
        F.col("_kw").alias("keyword"),
        F.col("_freq").cast("long").alias("frequency"),
        F.round(F.col("_freq") / F.col("_total") * 100, 2).alias("density"),
        F.when(F.col("_blk") == 0, F.lit("word")).otherwise(F.lit("phrase"))
        .alias("kw_type"),
        in_title.alias("in_title"), in_heads.alias("in_headings"),
        in_first.alias("in_first_paragraph"), in_meta.alias("in_meta"),
        in_concl.alias("in_conclusion"),
        prom.cast("int").alias("prominence_score"),
        F.col("rank").cast("int").alias("rank"),
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
