"""Numeric range facets: bucketing semantics + reconciliation."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.metadata import range_facets

DOCS = [
    (1, "common alpha", 50),
    (2, "common beta", 199),     # [0, 200)
    (3, "common gamma", 200),    # [200, 400)
    (4, "common delta", 400),    # [400, 800)
    (5, "common epsilon", 800),  # last bucket, closed right
    (6, "common zeta", 1000),    # last bucket
    (7, "common eta", -5),       # below range -> bucket -1
    (8, "unmatched word", 100),  # not a candidate: no row
]
EDGES = [0.0, 200.0, 400.0, 800.0, 1000.0]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    attrs = spark.createDataFrame(
        [(i, n) for i, _, n in DOCS], "doc_id long, n_chars long"
    )
    return build_index(docs, stem=False).cache(), attrs


def test_range_facet_buckets(spark, frames):
    idx, attrs = frames
    qt = qterms_df(spark, {1: "common"}, stem=False)
    rows = range_facets(qt, idx.postings_flat, attrs, "n_chars", EDGES).collect()
    got = {r.bucket: (r.lo, r.hi, r.n_docs) for r in rows}
    assert got[0] == (0.0, 200.0, 2)      # docs 1, 2
    assert got[1] == (200.0, 400.0, 1)    # doc 3 (left-closed)
    assert got[2] == (400.0, 800.0, 1)    # doc 4
    assert got[3] == (800.0, 1000.0, 2)   # docs 5, 6 (last right-closed)
    assert got[-1] == (None, None, 1)     # doc 7 out of range
    # totals reconcile with the candidate count (doc 8 never matched)
    assert sum(n for _, _, n in got.values()) == 7


def test_range_facet_validates_edges(spark, frames):
    idx, attrs = frames
    qt = qterms_df(spark, {1: "common"}, stem=False)
    for bad in ([], [1.0], [3.0, 1.0]):
        with pytest.raises(ValueError):
            range_facets(qt, idx.postings_flat, attrs, "n_chars", bad)
