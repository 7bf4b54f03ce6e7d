"""Redirect-chain boundary parity: the engine's distributed
resolve_redirects must agree with the oracle transcription
(spandoc.resolve_fetch, crawler.py:944-976 semantics) at the
MAX_REDIRECTS boundary — a chain of exactly MAX_REDIRECTS hops ending
in 200 resolves; MAX_REDIRECTS+1 hops (or a loop) errors."""

import pytest

from librecrawl_spark.functions import spandoc
from librecrawl_spark.functions.spandoc import MAX_REDIRECTS, resolve_fetch
from librecrawl_spark.operators.extract import http_meta, resolve_redirects


def _span(status, redirect=""):
    text = f"status={status};content_type=text/html;size=100"
    if redirect:
        text += f";redirect={redirect}"
    return [{"kind": "http", "text": text, "media_ref": "", "offset": 0}]


def _chain_docs(n_hops, loop=False):
    """u0 -> u1 -> ... -> u{n_hops} (final 200), or a loop back to u0."""
    docs = {}
    for i in range(n_hops):
        target = "https://x.example/u0" if (loop and i == n_hops - 1) else f"https://x.example/u{i + 1}"
        docs[f"https://x.example/u{i}"] = _span(301, target)
    if not loop:
        docs[f"https://x.example/u{n_hops}"] = _span(200)
    return docs


def _engine_rows(spark, docs):
    rows = [(doc_id, spans) for doc_id, spans in docs.items()]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = resolve_redirects(http_meta(df))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


@pytest.mark.parametrize("n_hops", [MAX_REDIRECTS - 1, MAX_REDIRECTS, MAX_REDIRECTS + 1])
def test_boundary_matches_oracle(spark, n_hops):
    docs = _chain_docs(n_hops)
    got = _engine_rows(spark, docs)["https://x.example/u0"]
    want = resolve_fetch("https://x.example/u0", docs)
    assert (got["error"], got["status_code"]) == (want["error"], want["status"])
    if want["error"] is None:
        assert got["final_doc_id"] == want["final_url"]
        assert len(got["redirect_chain"]) == len(want["chain"])
        assert [c["url"] for c in got["redirect_chain"]] == [c["url"] for c in want["chain"]]
    else:
        # errored chains keep the pre-final history only
        assert len(got["redirect_chain"]) == len(want["chain"])


def test_loop_detected(spark):
    docs = _chain_docs(3, loop=True)
    got = _engine_rows(spark, docs)["https://x.example/u0"]
    want = resolve_fetch("https://x.example/u0", docs)
    assert want["error"] == "too many redirects"
    assert got["error"] == "too many redirects"
    assert got["status_code"] == 0


def test_exactly_max_hops_resolves(spark):
    """The regression ADVICE flagged: 10 redirects ending in 200 must
    resolve (status 200, chain length 11), not error."""
    docs = _chain_docs(MAX_REDIRECTS)
    want = resolve_fetch("https://x.example/u0", docs)
    assert want["error"] is None and want["status"] == 200
    got = _engine_rows(spark, docs)["https://x.example/u0"]
    assert got["error"] is None
    assert got["status_code"] == 200
    assert len(got["redirect_chain"]) == MAX_REDIRECTS + 1
