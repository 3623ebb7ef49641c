"""Rocchio pseudo-relevance feedback: expansion semantics + retrieval."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.prf import prf_qterms, prf_topk

# designed corpus: 'anchor' appears with 'satellite' in docs 1-3, so a
# query for 'anchor' should lift 'satellite' as feedback expansion and
# pull in doc 4 (which has 'satellite' but NOT 'anchor').
DOCS = [
    (1, "anchor satellite alpha"),
    (2, "anchor satellite beta"),
    (3, "anchor satellite gamma"),
    (4, "satellite delta delta"),
    (5, "unrelated filler words here"),
    (6, "more unrelated filler text body"),
    # enough non-matching docs that 'satellite' (df=4) keeps df < N/2 —
    # a positive idf; negative-idf head terms are excluded from
    # expansion by design
    (7, "padding corpus noise entry"),
    (8, "padding corpus noise entry two"),
    (9, "padding corpus noise entry three"),
    (10, "padding corpus noise entry four"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(docs, stem=False).cache()


def _expanded(spark, idx, queries, **kw):
    qt = qterms_df(spark, queries, stem=False)
    return prf_qterms(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl, **kw
    ).collect()


def test_prf_lifts_cooccurring_term(spark, idx):
    rows = _expanded(spark, idx, {1: "anchor"}, fb_docs=3, fb_terms=4)
    by_term = {r.term: r.qweight for r in rows}
    # original kept at alpha
    assert by_term["anchor"] == pytest.approx(0.5)
    # 'satellite' co-occurs in every feedback doc → top expansion term,
    # normalized to (1 - alpha) exactly when it is the max-weight lift
    assert "satellite" in by_term
    top_exp = max(
        (w for t, w in by_term.items() if t != "anchor"),
    )
    assert top_exp == pytest.approx(0.5)
    # expansion weights never exceed (1 - alpha); nothing negative
    assert all(0 < w <= 0.5 + 1e-12 for w in by_term.values())


def test_prf_excludes_original_terms_from_expansion(spark, idx):
    rows = _expanded(spark, idx, {1: "anchor satellite"}, fb_docs=3)
    terms = [r.term for r in rows]
    assert terms.count("anchor") == 1
    assert terms.count("satellite") == 1


def test_prf_no_feedback_keeps_originals_only(spark, idx):
    rows = _expanded(spark, idx, {1: "zzznothingzzz"})
    # unknown term matches no docs -> no feedback set -> alpha-scaled
    # original passthrough only
    assert [(r.term, r.qweight) for r in rows] == [("zzznothingzzz", 0.5)]


def test_prf_topk_pulls_in_feedback_vocab_doc(spark, idx):
    res = prf_topk(
        qterms_df(spark, {1: "anchor"}, stem=False),
        idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl,
        k=10, fb_docs=3, fb_terms=4,
    ).collect()
    docs = {r.doc_id for r in res}
    # doc 4 has no query term at all — only PRF expansion can score it
    assert 4 in docs
    assert {1, 2, 3} <= docs
    # ranks deterministic and dense per qid
    assert sorted(r.rank for r in res) == list(range(1, len(res) + 1))
