"""L1/L2: citation-graph build + PageRank vs the pure-Python twin."""

import pytest

from themis_search_engine_spark.linkgraph import (
    citation_edges,
    pagerank,
    pagerank_py,
    synthetic_citations,
)


def test_citation_edges_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, ["a"], [1, 1, 2, 99]),   # dup edge → weight 2; 99 unknown
            (1, ["b"], [0, 1]),          # self-cite dropped
            (2, ["c"], []),
        ],
        "doc_id long, text array<string>, citations array<long>",
    )
    edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in citation_edges(docs).collect()
    }
    assert edges == {(0, 1): 2, (0, 2): 1, (1, 0): 1}


def test_pagerank_matches_python(spark):
    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    cited = synthetic_citations(docs)
    edges_df = citation_edges(cited)
    pr = {
        r["doc_id"]: r["pagerank"]
        for r in pagerank(edges_df, docs, damping=0.85, iterations=5).collect()
    }
    edges = [(r["src"], r["dst"], r["weight"]) for r in edges_df.collect()]
    want = pagerank_py(edges, list(range(20)), 0.85, 5)
    assert set(pr) == set(want)
    for v in pr:
        assert pr[v] == pytest.approx(want[v], rel=1e-12)
    # probability mass is conserved up to dangling leakage (no dangling
    # nodes in this synthetic graph → sums to 1)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
