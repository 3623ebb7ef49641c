"""LTR feature extraction (queryeng/ltr.py)."""

from __future__ import annotations

import math

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
from themis_search_engine_spark.queryeng.ltr import ltr_features

QUERIES = {1: "lazy dog", 2: "fox zzzunknown", 3: "engine"}


def test_bm25_feature_equals_scorer(spark, tiny_docs_df):
    idx = build_index(tiny_docs_df, stem=False)
    qt = qterms_df(spark, QUERIES, stem=False)
    feats = ltr_features(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    ).collect()
    scores = {
        (r["qid"], r["doc_id"]): r["score"]
        for r in bm25_score_all(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
        ).collect()
    }
    assert len(feats) == len(scores)  # same candidate set
    for r in feats:
        assert math.isclose(r["bm25"], scores[(r["qid"], r["doc_id"])],
                            rel_tol=1e-12)


def test_match_and_coverage_features(spark, tiny_docs_df):
    idx = build_index(tiny_docs_df, stem=False)
    qt = qterms_df(spark, QUERIES, stem=False)
    feats = {
        (r["qid"], r["doc_id"]): r
        for r in ltr_features(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
        ).collect()
    }
    # doc 2 "a lazy dog and another lazy lazy dog" matches both q1 terms
    r = feats[(1, 2)]
    assert r["n_matched"] == 2 and r["coverage"] == 1.0
    assert r["max_tf"] == 1.0  # "lazy" is doc 2's max-count term
    # q2 has an unknown term: coverage denominator still counts it
    r = feats[(2, 0)]
    assert r["n_matched"] == 1 and math.isclose(r["coverage"], 0.5)
    # idf features ordered
    for r in feats.values():
        assert r["min_idf"] <= r["max_idf"]
        assert 0 < r["coverage"] <= 1.0
        assert r["length"] > 0


def test_hard_negatives_triples(spark):
    from themis_search_engine_spark.queryeng.ltr import hard_negatives

    ranked = spark.createDataFrame(
        # qid 1 ranking: 10 (pos), 11, 12, 13 (pos), 14
        [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        # qid 2: only positives retrieved -> no negatives -> no rows
        + [(2, 20, 1)],
        "qid long, doc_id long, rank long",
    )
    judgments = spark.createDataFrame(
        [(1, 10, 1), (1, 13, 1), (1, 11, 0),   # 11 judged-irrelevant
         (2, 20, 1),
         (3, 30, 1)],                           # qid 3 never ranked
        "qid long, doc_id long, relevance int",
    )
    got = {
        (r.qid, r.pos_doc_id, r.neg_doc_id, r.neg_rank)
        for r in hard_negatives(ranked, judgments, per_query=2).collect()
    }
    # negatives for qid 1: 11 (judged-0 still qualifies) then 12;
    # each pairs with both positives
    want = {
        (1, 10, 11, 1), (1, 10, 12, 2),
        (1, 13, 11, 1), (1, 13, 12, 2),
    }
    assert got == want


def test_ltr_rerank_topk(spark):
    from themis_search_engine_spark.queryeng.ltr import ltr_rerank_topk

    feats = spark.createDataFrame(
        [(1, 10, 2.0, 1.0), (1, 11, 3.0, 0.5), (1, 12, 1.0, 1.0),
         (2, 20, 0.0, 1.0)],
        "qid int, doc_id long, bm25 double, coverage double",
    )
    out = {
        (r["qid"], r["rank"]): (r["doc_id"], r["ltr_score"])
        for r in ltr_rerank_topk(
            feats, {"bm25": 1.0, "coverage": 2.0}, k=2
        ).collect()
    }
    # doc 10: 2+2=4, doc 11: 3+1=4 (tie → doc_id asc), doc 12: 3 cut by k
    assert out[(1, 1)] == (10, 4.0)
    assert out[(1, 2)] == (11, 4.0)
    assert (1, 3) not in out
    assert out[(2, 1)] == (20, 2.0)
    # unknown feature names fail loud, never silently score 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown features"):
        ltr_rerank_topk(feats, {"bm25": 1.0, "pagerank": 1.0})
