"""Bloom-filter decontamination: one-sidedness, FP behavior, determinism."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.pipeline_ops.sampling import (
    bloom_bits,
    decontaminate,
    decontaminate_bloom,
)

DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma zebra"),      # shares 3-gram 'alpha beta gamma'
    (3, "one two three four five"),
    (4, "red green blue yellow pink"),
    (5, "lorem ipsum dolor sit amet"),
    (6, "six seven eight nine ten"),
]
EVAL = [(100, "alpha beta gamma epsilon")]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    return docs, ev


def test_bloom_never_false_negative(spark, frames):
    """Every doc the exact guard drops is dropped by the bloom guard too
    (bloom survivors ⊆ exact survivors) — at ANY filter size, including
    a pathologically tiny one where false positives are the norm."""
    docs, ev = frames
    exact = {r.doc_id for r in decontaminate(docs, ev, n=3).collect()}
    assert exact == {3, 4, 5, 6}  # docs 1,2 share 'alpha beta gamma'
    for m in (32, 256, 1 << 16):
        kept = {
            r.doc_id
            for r in decontaminate_bloom(docs, ev, n=3, m_bits=m).collect()
        }
        assert kept <= exact, m


def test_bloom_large_filter_matches_exact(spark, frames):
    """At a comfortable load factor (|S|·h ≪ m) the FP rate is ~0, so
    the bloom guard equals the exact guard on this corpus."""
    docs, ev = frames
    exact = {r.doc_id for r in decontaminate(docs, ev, n=3).collect()}
    kept = {
        r.doc_id
        for r in decontaminate_bloom(docs, ev, n=3, m_bits=1 << 16).collect()
    }
    assert kept == exact


def test_bloom_bits_shape_and_determinism(spark, frames):
    _, ev = frames
    sh = ev.selectExpr("explode(split(text, ' ')) AS shingle")
    w1 = sorted(
        (r.word_idx, r.word)
        for r in bloom_bits(sh, m_bits=256, n_hashes=4).collect()
    )
    w2 = sorted(
        (r.word_idx, r.word)
        for r in bloom_bits(sh, m_bits=256, n_hashes=4).collect()
    )
    assert w1 == w2 and len(w1) <= 256 // 32
    assert all(0 <= i < 8 and 0 < w < (1 << 32) for i, w in w1)
    with pytest.raises(ValueError):
        bloom_bits(sh, m_bits=100)  # not a power of two
