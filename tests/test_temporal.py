"""Recency-boosted retrieval (queryeng/temporal.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from themis_search_engine_spark.queryeng.temporal import (
    bm25_topk_recency,
    boost_scores,
    recency_boost,
)

NOW = 1_000_000


def test_recency_boost_values(spark):
    """2^(-age_days/half_life): exact at 0, half at one half-life,
    clamped to 1 for future timestamps."""
    hl = 7.0
    rows = (
        spark.createDataFrame(
            [
                (0, NOW),                       # fresh
                (1, NOW - 7 * 86400),           # one half-life old
                (2, NOW - 14 * 86400),          # two half-lives
                (3, NOW + 86400),               # clock skew: future
            ],
            "doc_id long, warc_ts long",
        )
        .select("doc_id", recency_boost("warc_ts", NOW, hl).alias("b"))
        .collect()
    )
    b = {r["doc_id"]: r["b"] for r in rows}
    assert b[0] == 1.0
    assert math.isclose(b[1], 0.5, rel_tol=1e-12)
    assert math.isclose(b[2], 0.25, rel_tol=1e-12)
    assert b[3] == 1.0  # clamped, never > 1


def test_boost_scores_left_join_keeps_untimestamped(spark):
    scored = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 3.0)], "qid int, doc_id long, score double"
    )
    ts = spark.createDataFrame(
        [(10, NOW - 7 * 86400)], "doc_id long, warc_ts long"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in boost_scores(scored, ts, NOW, 7.0).collect()
    }
    assert math.isclose(out[10], 1.0, rel_tol=1e-12)  # 2.0 * 0.5
    assert out[11] == 3.0  # missing ts -> unboosted, not dropped


def test_recency_flips_rank_of_stale_winner(spark, tiny_docs_df):
    """A doc that wins on BM25 alone but is old must fall below a
    fresher doc once the boost multiplies in — end-to-end through the
    full plan."""
    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng import qterms_df

    idx = build_index(tiny_docs_df, stem=False)
    qt = qterms_df(spark, {1: "lazy dog"}, stem=False)
    base = bm25_topk_recency(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl,
        # all docs equally fresh -> pure BM25 order
        tiny_docs_df.select("doc_id", F.lit(NOW).alias("warc_ts")),
        NOW, half_life_days=7.0, k=3,
    ).collect()
    winner = base[0]["doc_id"]
    runner = base[1]["doc_id"]
    # age the BM25 winner by 20 half-lives; runner-up stays fresh
    ts = tiny_docs_df.select(
        "doc_id",
        F.when(F.col("doc_id") == winner, F.lit(NOW - 140 * 86400))
        .otherwise(F.lit(NOW)).alias("warc_ts"),
    )
    boosted = bm25_topk_recency(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl,
        ts, NOW, half_life_days=7.0, k=3,
    ).collect()
    assert boosted[0]["doc_id"] == runner
    assert winner in [r["doc_id"] for r in boosted]  # demoted, not dropped
