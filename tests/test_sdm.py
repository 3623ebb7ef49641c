"""Sequential dependence model: proximity features rerank bag-of-words."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng.phrase import positional_index
from themis_search_engine_spark.queryeng.sdm import sdm_score_all


@pytest.fixture(scope="module")
def corpus(spark):
    # docs 1 and 2 have IDENTICAL bags of words for (hash, join): one of
    # each, same doc length — bag-of-words BM25 cannot separate them.
    # doc 1 has them adjacent; doc 2 puts 5 tokens between them.
    rows = [
        (1, "hash join alpha beta gamma delta eps"),
        (2, "hash alpha beta gamma delta eps join"),
        (3, "hash hash hash alpha beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_proximity_separates_equal_bags(spark, corpus):
    idx = build_index(corpus, stem=False, use_arrow=False).cache()
    pos = positional_index(corpus)
    out = {
        r.doc_id: r.score
        for r in sdm_score_all(
            spark, {1: ["hash", "join"]}, pos, idx.postings_flat,
            idx.dictionary, idx.doc_stats, idx.avgdl,
        ).where(F.col("qid") == 1).collect()
    }
    # identical unigram legs...
    assert 1 in out and 2 in out
    # ...but doc 1 gets the ordered feature (adjacent) AND the window
    # feature; doc 2 (gap 6 >= window 8? gap is 6 < 8) gets window only
    assert out[1] > out[2]
    # the delta is exactly the ordered leg: lambda_O * log2(1 + 1)
    assert out[1] - out[2] == pytest.approx(0.1 * math.log2(2), abs=1e-9)


def test_window_feature_and_left_join_semantics(spark, corpus):
    idx = build_index(corpus, stem=False, use_arrow=False).cache()
    pos = positional_index(corpus)
    scored = sdm_score_all(
        spark, {1: ["hash", "join"]}, pos, idx.postings_flat,
        idx.dictionary, idx.doc_stats, idx.avgdl,
        window=3,
    )
    out = {r.doc_id: r.score for r in scored.collect()}
    # doc 3 has no 'join' at all: scored by the unigram leg only (the
    # proximity legs coalesce to 0, never drop the doc)
    assert 3 in out
    # with window=3, doc 2's gap of 6 is outside the window: its score
    # is now the pure unigram leg, strictly below doc 1's
    assert out[1] > out[2]


def test_degenerate_same_term_pair_skipped(spark, corpus):
    idx = build_index(corpus, stem=False, use_arrow=False).cache()
    pos = positional_index(corpus)
    # "hash hash" pairs to (hash, hash) which is skipped -> unigram only
    out = sdm_score_all(
        spark, {1: ["hash", "hash"]}, pos, idx.postings_flat,
        idx.dictionary, idx.doc_stats, idx.avgdl,
    )
    rows = out.collect()
    assert rows and all(r.score is not None for r in rows)
