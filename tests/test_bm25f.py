"""BM25F field-weighted retrieval (queryeng/bm25f.py).

Pins: (a) the exact score on a tiny hand corpus against an independent
pure-Python computation of the Robertson-Zaragoza simple-BM25F formula;
(b) field assignment (positional boundary, stopwords dropped AFTER the
boundary so they occupy title slots); (c) the single-field degenerate
case equals raw-count BM25 arithmetic.
"""

from __future__ import annotations

import math

import pytest

from themis_search_engine_spark.queryeng.bm25f import (
    bm25f_score_all,
    fielded_counts,
)
from themis_search_engine_spark.queryeng import qterms_df

# title boundary = 3 tokens; 'the' is a stopword occupying a title slot
DOCS = [
    (0, "spark the shuffle join spark merge"),
    (1, "join window spark shuffle shuffle shuffle"),
    (2, "window order group sort"),
    (3, ""),  # token-less doc still counts toward N / avgwdl
]
W = {"title": 2.0, "body": 1.0}
K1, B = 2.0, 0.75


def _py_bm25f(docs, query_terms, w_title, w_body, title_tokens):
    """Independent reference computation (plain dicts, no Spark)."""
    wtf: dict[tuple[int, str], float] = {}
    wdl: dict[int, float] = {d: 0.0 for d, _ in docs}
    containing: dict[str, set[int]] = {}
    stop = {"the", "a", "of"}
    for doc_id, text in docs:
        toks = text.split()
        for pos, t in enumerate(toks):
            if t in stop:
                continue
            w = w_title if pos < title_tokens else w_body
            wtf[(doc_id, t)] = wtf.get((doc_id, t), 0.0) + w
            wdl[doc_id] += w
            containing.setdefault(t, set()).add(doc_id)
    n = len(docs)
    avgwdl = sum(wdl.values()) / n
    scores: dict[int, float] = {}
    for doc_id, _ in docs:
        s = 0.0
        hit = False
        for t in query_terms:
            key = (doc_id, t)
            if key not in wtf:
                continue
            hit = True
            df = len(containing[t])
            idf = math.log2((n - df + 0.5) / (df + 0.5))
            tf = wtf[key]
            s += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * wdl[doc_id] / avgwdl)
            )
        if hit:
            scores[doc_id] = s
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_fielded_counts_boundary_and_stopwords(spark, docs_df):
    fc = {
        (r.doc_id, r.field, r.term): r.cnt
        for r in fielded_counts(docs_df, title_tokens=3).collect()
    }
    # doc 0: positions spark(0) the(1,stop) shuffle(2) | join(3) spark(4)
    # merge(5) — 'the' consumed a title slot, then was dropped
    assert fc[(0, "title", "spark")] == 1
    assert fc[(0, "title", "shuffle")] == 1
    assert fc[(0, "body", "spark")] == 1
    assert fc[(0, "body", "join")] == 1
    assert (0, "title", "the") not in fc and (0, "body", "the") not in fc
    # doc 1: join window spark | shuffle ×3 in body
    assert fc[(1, "body", "shuffle")] == 3
    assert (1, "title", "shuffle") not in fc


def test_bm25f_matches_independent_computation(spark, docs_df):
    qt = qterms_df(spark, {1: "spark shuffle", 2: "window"}, stem=False)
    fc = fielded_counts(docs_df, title_tokens=3)
    got = {
        (r.qid, r.doc_id): r.score
        for r in bm25f_score_all(qt, fc, docs_df, weights=W).collect()
    }
    for qid, terms in {1: ["spark", "shuffle"], 2: ["window"]}.items():
        want = _py_bm25f(DOCS, terms, W["title"], W["body"], 3)
        got_q = {d: s for (q, d), s in got.items() if q == qid}
        assert set(got_q) == set(want)
        for d in want:
            assert got_q[d] == pytest.approx(want[d], rel=1e-12)


def test_single_field_degenerates_to_raw_count_bm25(spark, docs_df):
    """weights {title: 1, body: 1} → wtf = raw cnt, wdl = post-stopword
    length: the scores must equal the flat formula with w=1 everywhere."""
    qt = qterms_df(spark, {1: "spark shuffle join"}, stem=False)
    fc = fielded_counts(docs_df, title_tokens=3)
    got = {
        r.doc_id: r.score
        for r in bm25f_score_all(
            qt, fc, docs_df, weights={"title": 1.0, "body": 1.0}
        ).collect()
    }
    want = _py_bm25f(DOCS, ["spark", "shuffle", "join"], 1.0, 1.0, 3)
    assert got == pytest.approx(want, rel=1e-12)
