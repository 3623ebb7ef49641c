"""Dirichlet query likelihood: hand-computed scores, OOV handling."""

from __future__ import annotations

import math

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng.ql import ql_score_all


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta gamma"),
            (2, "alpha beta beta beta"),
            (3, "gamma gamma gamma delta"),
        ],
        "doc_id long, text string",
    )
    return build_index(docs, stem=False, use_arrow=False).cache()


def test_ql_hand_computed(spark, idx):
    mu = 10.0
    out = {
        (r.qid, r.doc_id): r.score
        for r in ql_score_all(
            spark, {1: ["alpha"]}, idx.counts, idx.doc_stats, mu=mu
        ).collect()
    }
    # corpus: 12 tokens, cf(alpha)=3 -> P=0.25
    p = 3 / 12
    for doc, cnt, dl in [(1, 2, 4), (2, 1, 4)]:
        want = math.log2(cnt + mu * p) - math.log2(dl + mu)
        assert out[(1, doc)] == pytest.approx(want, abs=1e-9)
    # doc 3 has no 'alpha': not a candidate
    assert (1, 3) not in out


def test_ql_multi_term_and_oov(spark, idx):
    mu = 10.0
    out = {
        (r.qid, r.doc_id): r.score
        for r in ql_score_all(
            spark,
            {1: ["alpha", "gamma", "zzzz"]},  # zzzz is OOV -> dropped
            idx.counts, idx.doc_stats, mu=mu,
        ).collect()
    }
    t = 12.0
    pa, pg = 3 / t, 4 / t
    # doc 1 has alpha(2) and gamma(1); dl 4
    want = (
        math.log2(2 + mu * pa) + math.log2(1 + mu * pg)
        - 2 * math.log2(4 + mu)
    )
    assert out[(1, 1)] == pytest.approx(want, abs=1e-9)
    # doc 3 matches only gamma(3): absent alpha still contributes its
    # smoothed mass via the decomposition
    want3 = (
        math.log2(3 + mu * pg) + math.log2(mu * pa)
        - 2 * math.log2(4 + mu)
    )
    assert out[(1, 3)] == pytest.approx(want3, abs=1e-9)


def test_ql_all_oov_query_is_empty(spark, idx):
    out = ql_score_all(
        spark, {1: ["zzzz", "yyyy"]}, idx.counts, idx.doc_stats
    ).collect()
    assert out == []
