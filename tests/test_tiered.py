"""Tiered retrieval / champion lists (queryeng/tiered.py): tier
membership is the per-term top-c by idf-free impact; scoring over the
tier keeps full-corpus stats; c ≥ max df degenerates to the untiered
plan exactly."""

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
from themis_search_engine_spark.queryeng.tiered import (
    champion_lists,
    tiered_topk,
)

QUERIES = {1: "lazy dog", 2: "spark engine", 3: "quick fox"}


@pytest.fixture(scope="module")
def idx(tiny_docs_df):
    return build_index(tiny_docs_df, stem=False, use_arrow=False).cache()


def test_tier_caps_per_term(spark, idx):
    tier = champion_lists(idx.postings_flat, idx.doc_stats, idx.avgdl, c=2)
    per_term = {
        r["term"]: r["n"]
        for r in tier.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    assert per_term
    assert all(n <= 2 for n in per_term.values())
    # a term with df <= c keeps its whole posting list
    df1_terms = [
        r["term"] for r in idx.dictionary.where("df <= 2").collect()
    ]
    for t in df1_terms:
        df = idx.dictionary.where(F.col("term") == t).first()["df"]
        assert per_term.get(t) == df


def test_tier_membership_matches_python(spark, idx):
    """Per-term top-c by (round(impact,6) desc, doc_id asc) recomputed
    in plain Python from the raw postings."""
    from themis_search_engine_spark.queryeng.tiered import impact_expr  # noqa: F401

    p = idx.postings_flat
    if "length" not in p.columns:
        p = p.join(idx.doc_stats.select("doc_id", "length"), "doc_id")
    rows = p.select("term", "doc_id", "tf", "length").collect()
    K1, B = 2.0, 0.75
    want = {}
    for r in rows:
        imp = round(
            r["tf"] * (K1 + 1.0)
            / (r["tf"] + K1 * (1.0 - B + B * r["length"] / idx.avgdl)),
            6,
        )
        want.setdefault(r["term"], []).append((-imp, r["doc_id"]))
    c = 2
    want = {
        t: {d for _, d in sorted(v)[:c]} for t, v in want.items()
    }
    got = {}
    tier = champion_lists(idx.postings_flat, idx.doc_stats, idx.avgdl, c=c)
    for r in tier.collect():
        got.setdefault(r["term"], set()).add(r["doc_id"])
    assert got == want


def test_large_c_degenerates_to_full(spark, idx):
    """c ≥ max df: the tier IS the postings, so tiered top-k equals the
    untiered rounded top-k row-for-row."""
    from pyspark.sql.window import Window

    qt = qterms_df(spark, QUERIES, stem=False)
    tier = champion_lists(
        idx.postings_flat, idx.doc_stats, idx.avgdl, c=10_000
    )
    tiered = sorted(
        tuple(r)
        for r in tiered_topk(
            qt, tier, idx.dictionary, idx.doc_stats, idx.avgdl,
            k=5, round_dp=6,
        ).collect()
    )
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    full = sorted(
        tuple(r)
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= 5)
        .select("qid", "doc_id", F.round("score", 6).alias("score"), "rank")
        .collect()
    )
    assert tiered == full


def test_score_bound_contract(spark, idx):
    """Champion-list semantics: a tiered score is a LOWER BOUND on the
    untiered score (per-term pruning can drop one term's contribution),
    and EXACT for single-term queries (one tier, membership == scoring).
    Caveat: with negative-idf terms a dropped contribution RAISES the
    sum, so the bound check uses only positive-idf query sets."""
    qt = qterms_df(spark, {1: "sparking", 2: "jumps quick"}, stem=False)
    want = {
        (r["qid"], r["doc_id"]): round(r["score"], 6)
        for r in bm25_score_all(
            qt, idx.postings_flat, idx.dictionary,
            idx.doc_stats, idx.avgdl,
        ).collect()
    }
    tier = champion_lists(idx.postings_flat, idx.doc_stats, idx.avgdl, c=1)
    rows = tiered_topk(
        qt, tier, idx.dictionary, idx.doc_stats, idx.avgdl, k=5, round_dp=6
    ).collect()
    assert rows
    for r in rows:
        full = want[(r["qid"], r["doc_id"])]
        got = round(r["score"], 6)
        assert got <= full + 1e-9
        if r["qid"] == 1:  # single-term query: exact
            assert got == full


def test_fallback_composite(spark, idx):
    """Under-filled queries return EXACTLY the full-plan top-k; filled
    queries keep their tier-1 rows; the union is per-qid disjoint."""
    from pyspark.sql.window import Window

    from themis_search_engine_spark.queryeng.tiered import (
        tiered_topk_with_fallback,
    )

    qt = qterms_df(spark, QUERIES, stem=False)
    tier = champion_lists(idx.postings_flat, idx.doc_stats, idx.avgdl, c=1)
    k = 3
    got = tiered_topk_with_fallback(
        qt, tier, idx.postings_flat, idx.dictionary, idx.doc_stats,
        idx.avgdl, k=k, round_dp=6,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)

    # full-plan reference
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    full = {}
    for r in (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", F.round("score", 6).alias("score"), "rank")
        .collect()
    ):
        full.setdefault(r["qid"], []).append(r)

    t1 = {
        r["qid"]: r["n"]
        for r in tiered_topk(
            qt, tier, idx.dictionary, idx.doc_stats, idx.avgdl,
            k=k, round_dp=6,
        ).groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    assert any(n < k for n in t1.values())  # c=1 under-fills someone
    for qid, n in t1.items():
        if n < k:  # fell back: rows are the full plan's, verbatim
            assert sorted(map(tuple, by_q[qid])) == sorted(
                map(tuple, full[qid])
            )
        else:      # served from tier: exactly k rows, ranks 1..k
            assert sorted(r["rank"] for r in by_q[qid]) == list(
                range(1, k + 1)
            )
