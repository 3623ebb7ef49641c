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


def test_pagerank_deep_iterations_bounded_lineage(spark):
    """20 iterations with periodic localCheckpoint: values still match the
    pure-Python twin AND the final plan's join count stays bounded by the
    checkpoint interval (lineage truncated), not by total iterations."""
    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    edges_df = citation_edges(synthetic_citations(docs))
    out = pagerank(edges_df, docs, damping=0.85, iterations=20,
                   checkpoint_every=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # lineage was truncated to the checkpointed RDD...
    assert "LogicalRDD" in plan
    # ...and plan size reflects ≤ checkpoint_every trailing iterations,
    # not all 20: the unbounded plan must be several times larger. (Join
    # counts include the cached `trans` subtree each iteration re-prints,
    # so compare, don't count absolutes.)
    unbounded = pagerank(edges_df, docs, damping=0.85, iterations=20,
                         checkpoint_every=10**9)
    uplan = unbounded._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") * 3 <= uplan.count("Join")

    pr = {r["doc_id"]: r["pagerank"] for r in out.collect()}
    edges = [(r["src"], r["dst"], r["weight"]) for r in edges_df.collect()]
    want = pagerank_py(edges, list(range(20)), 0.85, 20)
    for v in pr:
        assert pr[v] == pytest.approx(want[v], rel=1e-12)


def test_cocitation_and_bib_coupling(spark):
    """Hand graph: docs 1 and 2 are both cited by 10 and 11 (co-citation
    strength 2); docs 10 and 11 share references 1 and 2 (coupling 2);
    weaker pairs fall below min_strength."""
    from themis_search_engine_spark.linkgraph import bib_coupling, cocitation

    edges = spark.createDataFrame(
        [
            (10, 1, 1), (10, 2, 1), (10, 3, 1),
            (11, 1, 1), (11, 2, 1),
            (12, 3, 1),
        ],
        "src long, dst long, weight long",
    )
    co = {(r.doc_a, r.doc_b): r.strength
          for r in cocitation(edges, min_strength=2).collect()}
    assert co == {(1, 2): 2}
    bc = {(r.doc_a, r.doc_b): r.strength
          for r in bib_coupling(edges, min_strength=2).collect()}
    assert bc == {(10, 11): 2}


def test_hits_matches_python_twin(spark):
    from themis_search_engine_spark.linkgraph import hits, hits_py

    edges = [(1, 2, 1), (1, 3, 2), (2, 3, 1), (4, 1, 1), (3, 1, 1)]
    nodes = [1, 2, 3, 4, 5]  # 5 is isolated
    e = spark.createDataFrame(edges, "src long, dst long, weight long")
    n = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
    got = {
        r["doc_id"]: (r["hub"], r["authority"])
        for r in hits(e, n, iterations=5).collect()
    }
    want = hits_py(edges, nodes, iterations=5)
    assert set(got) == set(want)
    for v in nodes:
        assert abs(got[v][0] - want[v][0]) < 1e-9
        assert abs(got[v][1] - want[v][1]) < 1e-9
    # isolated node scores zero on both axes
    assert got[5] == (0.0, 0.0)


def test_hits_edgeless_graph_is_all_zero(spark):
    """No edges: the L2 normalizer guard yields zeros, never NaN/null."""
    from themis_search_engine_spark.linkgraph import hits

    e = spark.createDataFrame([], "src long, dst long, weight long")
    n = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = hits(e, n, iterations=2).collect()
    assert sorted((r["doc_id"], r["hub"], r["authority"]) for r in rows) == [
        (1, 0.0, 0.0), (2, 0.0, 0.0),
    ]


def test_static_rank_blend_reorders(spark):
    """Two docs with near-equal BM25: the one every other page links to
    must win after the blend; docs without a rank row get addend 0."""
    import math

    from themis_search_engine_spark.queryeng.staticrank import (
        blend_static_rank,
    )

    scored = spark.createDataFrame(
        [(1, 10, 0.50), (1, 20, 0.51), (1, 30, 0.40)],
        "qid long, doc_id long, score double",
    )
    pr = spark.createDataFrame(
        [(10, 0.30), (20, 0.01)], "doc_id long, pagerank double"
    )  # doc 30 has no rank row
    out = {
        r["doc_id"]: r["score"]
        for r in blend_static_rank(scored, pr, n_docs=10, alpha=0.5).collect()
    }
    assert abs(out[10] - (0.50 + 0.5 * math.log(10 * 0.30 + 1))) < 1e-12
    assert abs(out[20] - (0.51 + 0.5 * math.log(10 * 0.01 + 1))) < 1e-12
    assert out[30] == 0.40  # ln(1) = 0 addend
    assert out[10] > out[20] > out[30]  # the hub overtook the text winner


def test_trustrank_matches_python_and_decays(spark):
    from themis_search_engine_spark.linkgraph import trustrank, trustrank_py

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    edges_df = citation_edges(synthetic_citations(docs))
    seeds = docs.where("doc_id % 5 = 0")
    tr = {
        r["doc_id"]: r["trust"]
        for r in trustrank(
            edges_df, docs, seeds, damping=0.85, iterations=5
        ).collect()
    }
    edges = [(r["src"], r["dst"], r["weight"]) for r in edges_df.collect()]
    want = trustrank_py(edges, list(range(20)), [0, 5, 10, 15], 0.85, 5)
    assert set(tr) == set(want)
    for v in tr:
        assert tr[v] == pytest.approx(want[v], rel=1e-9, abs=1e-12), v
    # seeds carry teleport mass; total trust <= 1 (mass only leaks,
    # never appears)
    assert sum(tr.values()) <= 1.0 + 1e-9
    assert all(tr[s] > 0 for s in (0, 5, 10, 15))


def test_trustrank_unreachable_stays_zero(spark):
    from themis_search_engine_spark.linkgraph import trustrank

    # 0 -> 1 -> 2, and isolated 3; seed = {0}
    docs = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1)], "src long, dst long, weight long"
    )
    seeds = docs.where("doc_id = 0")
    tr = {
        r["doc_id"]: r["trust"]
        for r in trustrank(edges, docs, seeds, iterations=4).collect()
    }
    assert tr[3] == 0.0          # unreachable from the seed set
    assert tr[0] > tr[1] > tr[2] > 0  # decays with distance
    import pytest as _pt
    with _pt.raises(ValueError):
        trustrank(edges, docs, docs.where("doc_id < 0"), iterations=2)
