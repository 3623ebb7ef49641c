"""Rank-identity of the Spark BM25/VSM/existential scorers vs the
pure-Python oracle (FIXTURES.md §6 bm25.golden) — tiny corpus + a 500-doc
slice of the driver testdata.
"""

import pytest

from themis_search_engine_spark.corpus import load_documents
from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.oracle import OracleIndex
from themis_search_engine_spark.queryeng import bm25_topk, qterms_df
from themis_search_engine_spark.queryeng.existential import existential
from themis_search_engine_spark.queryeng.vsm import vsm_score_all

from tests.conftest import TINY_DOCS

QUERIES = {
    1: "lazy dog",
    2: "spark engine query",
    3: "the and of",          # all stopwords → no results
    4: "zzzzunknownzzz fox",  # unknown term dropped silently (Q1)
    5: "quick",
}


@pytest.fixture(scope="module")
def idx(tiny_docs_df):
    return build_index(tiny_docs_df, stem=True, with_norms=True).cache()


@pytest.fixture(scope="module")
def oidx():
    return OracleIndex.build(TINY_DOCS, stem=True)


def _spark_ranked(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: [(d, s) for _, d, s in sorted(v)] for q, v in out.items()}


def test_bm25_rank_identical_tiny(spark, idx, oidx):
    qt = qterms_df(spark, QUERIES)
    got = _spark_ranked(
        bm25_topk(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl, k=10
        ).collect()
    )
    for qid, q in QUERIES.items():
        want = oidx.bm25(q, k=10)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, q)
        for (d1, s1), (d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, rel=1e-12), (qid, d1)


def test_vsm_rank_identical_tiny(spark, idx, oidx):
    qt = qterms_df(spark, QUERIES)
    scored = vsm_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.n_docs
    ).collect()
    by_qid = {}
    for r in scored:
        by_qid.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, q in QUERIES.items():
        want = oidx.vsm(q, k=None)
        have = sorted(by_qid.get(qid, []), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in have] == [d for d, _ in want], (qid, q)
        for (d1, s1), (d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, rel=1e-12)


def test_existential_tiny(spark, idx, oidx):
    qt = qterms_df(spark, QUERIES)
    rows = existential(qt, idx.postings_flat).collect()
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], set()).add(r["doc_id"])
    for qid, q in QUERIES.items():
        assert sorted(by_qid.get(qid, set())) == oidx.existential(q), (qid, q)


def test_bm25_rank_identical_testdata(spark):
    """End-to-end rank identity on real driver testdata (sf0.001)."""
    docs = load_documents(spark, "/root/testdata/sf0.001")
    pdocs = {r["doc_id"]: r["text"] for r in docs.collect()}
    oidx = OracleIndex.build(pdocs, stem=True)
    idx = build_index(docs, stem=True).cache()
    queries = {
        1: "spark shuffle join",
        2: "window aggregate stream",
        3: "the fast key order",
        4: "hash",
    }
    qt = qterms_df(spark, queries)
    got = _spark_ranked(
        bm25_topk(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl, k=20
        ).collect()
    )
    for qid, q in queries.items():
        want = oidx.bm25(q, k=20)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, q)
        for (d1, s1), (d2, s2) in zip(have, want):
            assert s1 == pytest.approx(s2, rel=1e-9)


def test_doc_keywords_salience_rule(spark):
    """doc_keywords: rank by cnt·idf desc (6-dp rounded), term-asc ties,
    capped per doc."""
    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng.mlt import doc_keywords

    docs = spark.createDataFrame(
        [
            (0, "rare rare common"),
            (1, "common zebra"),
            (2, "common unique"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, stem=False, use_arrow=False)
    got = {
        (r.doc_id, r.rank): r.term
        for r in doc_keywords(idx.counts, idx.dictionary, top_terms=2).collect()
    }
    # doc 0: 'rare' cnt=2, df=1 → top; 'common' df=3 (negative idf) below
    assert got[(0, 1)] == "rare" and got[(0, 2)] == "common"
    # doc 1: 'zebra' (df=1) beats 'common' (df=3)
    assert got[(1, 1)] == "zebra"
    # every doc capped at 2
    assert max(rank for _d, rank in got) <= 2


def test_explain_parts_sum_to_score_and_pagination_continues(spark):
    """explain: per-term parts sum exactly to the scorer's score;
    search_after: page 2 = canonical ranks k+1..2k, disjoint from page 1."""
    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng import qterms_df
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
    from themis_search_engine_spark.queryeng.explain import (
        explain_scores,
        search_after,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common w{i % 7}") for i in range(30)],
        "doc_id long, text string",
    )
    idx = build_index(docs, stem=False, use_arrow=False)
    qt = qterms_df(spark, {1: "common w1", 2: "w2"}, stem=False)
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    pairs = scored.limit(8).select("qid", "doc_id")
    parts = explain_scores(
        qt, pairs, idx.postings_flat, idx.dictionary, idx.doc_stats,
        idx.avgdl,
    )
    want = {(r.qid, r.doc_id): r.score for r in scored.join(
        pairs, ["qid", "doc_id"], "left_semi").collect()}
    got = {}
    for r in parts.collect():
        got[(r.qid, r.doc_id)] = got.get((r.qid, r.doc_id), 0.0) + r.part
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-9

    from pyspark.sql import functions as F

    from themis_search_engine_spark.registry import _rounded_rank_topk

    k = 5
    page1 = _rounded_rank_topk(scored, k)
    cursors = page1.where(F.col("rank") == k).select(
        "qid",
        F.col("score").alias("after_score"),
        F.col("doc_id").alias("after_doc_id"),
    )
    page2 = search_after(scored, cursors, k)
    p1 = {(r.qid, r.doc_id) for r in page1.collect()}
    p2 = {(r.qid, r.doc_id) for r in page2.collect()}
    assert p1 and p2 and not (p1 & p2)
    # page2 == canonical ranks 6..10
    full = _rounded_rank_topk(scored, 2 * k)
    want2 = {(r.qid, r.doc_id) for r in full.collect() if r.rank > k}
    assert p2 == want2
