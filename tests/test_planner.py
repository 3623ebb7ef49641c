"""Physical-plan dispatcher: decision matrix + facade rank-identity."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.corpus import load_documents
from themis_search_engine_spark.indexing.build import build_and_save_serving
from themis_search_engine_spark.queryeng.planner import (
    choose_query_plan,
    search_serving,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(**kw):
    n = kw.pop("n", 1)
    return choose_query_plan(n, **kw)["plan"]


def test_decision_matrix():
    # interactive small batches: in-process unless a head term or no
    # persisted layout
    assert _plan(n=1, interactive=True) == "local"
    assert _plan(n=4, interactive=True) == "local"
    assert _plan(n=1, interactive=True, max_df_frac=0.5) == "sharded"
    assert _plan(n=1, interactive=True, has_persisted=False) == "single"
    assert (
        _plan(n=1, interactive=True, max_df_frac=0.5, has_persisted=False)
        == "batch"
    )
    # non-interactive small batches: one-job sequential WAND
    assert _plan(n=8) == "single"
    assert _plan(n=16) == "single"
    # head terms push any batch to the shard-parallel plan
    assert _plan(n=8, max_df_frac=0.2) == "sharded"
    # big batches: throughput plan; without a layout the barrier-free
    # greedy per-query plan (measured 3.2x the one-pass chunk plan,
    # BATCH_PLANS.json); the chunk plan only remains for head-term
    # batches that would serialize one query's postings in one task
    assert _plan(n=50) == "sharded"
    assert _plan(n=50, has_persisted=False) == "single"
    assert _plan(n=50, has_persisted=False, max_df_frac=0.2) == "batch"
    # every decision carries at least one reason
    assert choose_query_plan(50)["reasons"]


@pytest.fixture(scope="module")
def saved_idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("planner") / "idx")
    docs = load_documents(spark, SF_DIR).select("doc_id", "text")
    build_and_save_serving(docs, p, stem=False, partitions=8)
    return p


def test_search_serving_plans_rank_identical(spark, saved_idx):
    """All four forced plans return the same (qid, doc_id, rank) sets —
    the dispatcher's choice is purely physical."""
    queries = {1: ["spark", "join"], 2: ["window", "merge", "scan"]}

    def key(df):
        rows = df.collect() if hasattr(df, "collect") else df
        return sorted((r.qid, r.doc_id, r.rank) for r in rows)

    results = {
        p: key(search_serving(spark, saved_idx, queries, k=5, plan=p))
        for p in ("local", "single", "sharded", "batch")
    }
    assert results["local"] == results["single"]
    assert results["local"] == results["sharded"]
    assert results["local"] == results["batch"]
    assert len(results["local"]) > 0


def test_search_serving_auto_and_unknown(spark, saved_idx):
    queries = {7: ["spark"]}
    auto = search_serving(
        spark, saved_idx, queries, k=3, interactive=True
    ).collect()
    assert len(auto) == 3 and all(r.qid == 7 for r in auto)
    with pytest.raises(ValueError):
        search_serving(spark, saved_idx, queries, plan="warp")


def test_scan_filter_matrix():
    from themis_search_engine_spark.queryeng.planner import (
        choose_scan_filter,
    )

    # small vocab over a big dictionary: IN-list prunes the scan
    assert choose_scan_filter(50, 5000)["filter"] == "inlist"
    # vocabulary covering most of the dictionary: predicate is overhead
    # (measured 2.2x at full coverage, INLIST_CROSSOVER.json)
    assert choose_scan_filter(2500, 5000)["filter"] == "join_only"
    assert choose_scan_filter(5000, 5000)["filter"] == "join_only"
    # plan-size bound regardless of dictionary knowledge
    assert choose_scan_filter(20_000, -1)["filter"] == "join_only"
    # unknown dictionary size: literal cap alone
    assert choose_scan_filter(5000, -1)["filter"] == "inlist"
    assert choose_scan_filter(0, 5000)["filter"] == "join_only"
    assert choose_scan_filter(50, 5000)["reasons"]
