"""Cursor pagination walk + total hits (queryeng/explain.py)."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import bm25_score_all, qterms_df
from themis_search_engine_spark.queryeng.explain import (
    search_after,
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


def test_pages_tile_the_full_ranking(spark, idx, qt):
    """Walking pages of 7 via cursors reproduces the full 25-doc ranking
    exactly, in order, with no overlap and no gap — the page-walk form
    of the page-2 identity test_bm25 pins."""
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    full = sorted(_rounded_topk_salted(scored, 1000).collect(),
                  key=lambda r: r.rank)
    assert len(full) == 25
    walked = []
    cursor_rows = None
    for _page in range(4):
        if cursor_rows is None:
            page = _rounded_topk_salted(scored, 7).collect()
        else:
            cursors = spark.createDataFrame(
                cursor_rows, "qid long, after_score double, after_doc_id long"
            )
            page = search_after(scored, cursors, 7).collect()
        page = sorted(page, key=lambda r: r.rank)
        if not page:
            break
        walked.extend(page)
        last = page[-1]
        cursor_rows = [(1, float(last.score), int(last.doc_id))]
    assert [r.doc_id for r in walked] == [r.doc_id for r in full]
    for w, f in zip(walked, full):
        assert w.score == pytest.approx(f.score, rel=1e-12)


def test_total_hits(spark, idx):
    qt = qterms_df(spark, {1: "common", 2: "filler3", 3: "zzznone"}, stem=False)
    got = {r.qid: r.n_hits for r in total_hits(qt, idx.postings_flat).collect()}
    assert got[1] == 25      # every doc has 'common'
    assert got[2] == 1       # exactly doc 3 has 'filler3'
    assert 3 not in got      # no matching term -> no row
