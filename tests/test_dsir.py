"""DSIR importance weights: python-twin parity + steering property."""

from __future__ import annotations

import hashlib
import math

import pytest

from themis_search_engine_spark.pipeline_ops.sampling import (
    dsir_logweights,
    ngram_occurrences,
)

# raw corpus: half "science" flavored, half "spam" flavored; target set
# is pure science — science docs must weigh higher.
SCIENCE = ["quantum field theory lecture notes", "peer reviewed physics paper",
           "theorem proof lemma corollary", "experiment method result physics"]
SPAM = ["buy cheap pills now click", "winner free prize click here",
        "cheap cheap deal buy now", "click buy free winner deal"]
DOCS = [(i + 1, t) for i, t in enumerate(SCIENCE + SPAM)]
TARGET = [(100 + i, t) for i, t in enumerate(
    ["physics theorem lecture", "quantum experiment proof paper"]
)]

M = 64
ALPHA = 1.0
SALT = "dsir"


def _bucket(gram: str) -> int:
    h = hashlib.md5(f"{SALT}|{gram}".encode()).hexdigest()[:8]
    return int(h, 16) % M


def _grams(text: str) -> list[str]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    out = list(toks)
    out += [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    return out


def _model(texts: list[str]) -> dict[int, float]:
    cnt: dict[int, int] = {b: 0 for b in range(M)}
    for t in texts:
        for g in _grams(t):
            cnt[_bucket(g)] += 1
    tot = sum(cnt.values())
    return {b: math.log((c + ALPHA) / (tot + ALPHA * M)) for b, c in cnt.items()}


def _expected() -> dict[int, float]:
    p_r = _model([t for _, t in DOCS])
    p_t = _model([t for _, t in TARGET])
    out = {}
    for i, t in DOCS:
        out[i] = sum(p_t[_bucket(g)] - p_r[_bucket(g)] for g in _grams(t))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return docs, tgt


def test_ngram_occurrences_bag_semantics(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    uni = [r.gram for r in ngram_occurrences(df, 1).collect()]
    bi = sorted(r.gram for r in ngram_occurrences(df, 2).collect())
    assert sorted(uni) == ["a", "a", "a", "b", "b"]  # multiplicity kept
    assert bi == ["a b", "a b", "b a", "b a"]
    # short docs emit nothing at n=2
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert ngram_occurrences(one, 2).count() == 0


def test_dsir_matches_python_twin(spark, frames):
    docs, tgt = frames
    got = {
        r.doc_id: r.logw
        for r in dsir_logweights(docs, tgt, m_buckets=M, alpha=ALPHA).collect()
    }
    want = _expected()
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(round(want[d], 6), abs=2e-6), d


def test_dsir_steers_toward_target(spark, frames):
    docs, tgt = frames
    got = {
        r.doc_id: r.logw
        for r in dsir_logweights(docs, tgt, m_buckets=M, alpha=ALPHA).collect()
    }
    science = [got[i] for i in (1, 2, 3, 4)]
    spam = [got[i] for i in (5, 6, 7, 8)]
    assert min(science) > max(spam)
