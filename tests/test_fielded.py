"""Fielded query syntax (queryeng/fielded.py): parse contract and the
restriction semantics (scores unrestricted, membership filtered, refill
not post-filter)."""

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
from themis_search_engine_spark.queryeng.fielded import (
    fielded_topk,
    parse_fielded,
)
from themis_search_engine_spark.queryeng.pipeline import qterms_df


def test_parse_fielded():
    assert parse_fielded("lang:en spark shuffle") == (
        "spark shuffle", [("lang", "en", False)]
    )
    assert parse_fielded("lang:EN source:News x") == (
        "x", [("lang", "en", False), ("source", "news", False)]
    )
    assert parse_fielded("-lang:de dog") == ("dog", [("lang", "de", True)])
    # unknown field stays in the free text — prose colons must not filter
    assert parse_fielded("re:match spark") == ("re:match spark", [])
    assert parse_fielded("plain words only") == ("plain words only", [])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox", "en", "a"),
        (1, "lazy dog sleeps", "en", "b"),
        (2, "quick dog runs", "de", "a"),
        (3, "fox and dog play", "de", "b"),
        (4, "quick quick fox fox", "en", "a"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    idx = build_index(
        docs.select("doc_id", "text"), stem=False, use_arrow=False
    ).cache()
    return docs, idx


def test_fielded_restriction_and_refill(spark, corpus):
    docs, idx = corpus
    queries = {
        1: "lang:en fox",          # en docs only
        2: "lang:de source:b dog",  # both filters must hold
        3: "dog",                   # unfiltered
        4: "lang:fr dog",           # matches no doc → zero rows
        5: "-lang:en dog",          # exclusion only
        6: "source:a -lang:de quick",  # mixed include + exclude
    }
    out = fielded_topk(
        spark, queries, idx.postings_flat, idx.dictionary, idx.doc_stats,
        idx.avgdl, docs, k=5, round_dp=6,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    en_ids = {0, 1, 4}
    assert {r["doc_id"] for r in by_q[1]} <= en_ids
    assert {r["doc_id"] for r in by_q[2]} == {3}  # de AND b AND has dog
    assert 4 not in by_q
    assert {r["doc_id"] for r in by_q[5]} == {2, 3}   # de docs with dog
    assert {r["doc_id"] for r in by_q[6]} == {0, 4}   # source a, not de
    # unfiltered query equals plain retrieval
    qt = qterms_df(spark, {3: "dog"}, stem=False)
    plain = {
        (r["qid"], r["doc_id"])
        for r in bm25_score_all(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats,
            idx.avgdl,
        ).collect()
    }
    assert {(3, r["doc_id"]) for r in by_q[3]} == plain
    # scores are the UNRESTRICTED values (filter changes membership only)
    qt1 = qterms_df(spark, {1: "fox"}, stem=False)
    unrestricted = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_score_all(
            qt1, idx.postings_flat, idx.dictionary, idx.doc_stats,
            idx.avgdl,
        ).collect()
    }
    for r in by_q[1]:
        assert round(r["score"], 6) == unrestricted[r["doc_id"]]
    # refill: ranks dense 1..n within each answered query
    for qid, rows_ in by_q.items():
        assert sorted(r["rank"] for r in rows_) == list(
            range(1, len(rows_) + 1)
        )
