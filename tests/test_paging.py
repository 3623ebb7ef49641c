"""Cursor pagination + total hits: page identity, walk-the-corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import bm25_score_all, qterms_df
from themis_search_engine_spark.queryeng.paging import (
    search_after_topk,
    total_hits,
)
from themis_search_engine_spark.queryeng.prf import _rounded_topk_salted

DOCS = [(i, f"common word{'x' * (i % 3)} filler{i}") for i in range(1, 26)]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(docs, stem=False).cache()


@pytest.fixture(scope="module")
def qt(spark):
    return qterms_df(spark, {1: "common"}, stem=False)


def _full_ranking(qt, idx, k=1000):
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    return _rounded_topk_salted(scored, k).collect()


def test_pages_tile_the_full_ranking(spark, idx, qt):
    """Walking pages of 7 via cursors reproduces the full 25-doc ranking
    exactly, in order, with no overlap and no gap."""
    full = sorted(_full_ranking(qt, idx), key=lambda r: r.rank)
    assert len(full) == 25
    walked = []
    cursors: dict = {}
    for _page in range(4):
        rows = search_after_topk(
            qt, idx.postings_flat, idx.dictionary, idx.doc_stats,
            idx.avgdl, cursors, k=7,
        ).collect()
        rows = sorted(rows, key=lambda r: r.rank)
        if not rows:
            break
        walked.extend(rows)
        last = rows[-1]
        cursors = {1: (last.score, last.doc_id)}
    assert [(r.doc_id, r.score) for r in walked] == [
        (r.doc_id, r.score) for r in full
    ]


def test_empty_cursor_is_first_page(spark, idx, qt):
    p1 = search_after_topk(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl,
        {}, k=5,
    ).collect()
    full = sorted(_full_ranking(qt, idx), key=lambda r: r.rank)[:5]
    assert sorted((r.doc_id, r.rank) for r in p1) == sorted(
        (r.doc_id, r.rank) for r in full
    )


def test_total_hits(spark, idx):
    qt = qterms_df(spark, {1: "common", 2: "filler3", 3: "zzznone"}, stem=False)
    got = {r.qid: r.n_hits for r in total_hits(qt, idx.postings_flat).collect()}
    assert got[1] == 25      # every doc has 'common'
    assert got[2] == 1       # exactly doc 3 has 'filler3'
    assert 3 not in got      # no matching term -> no row
