"""Sequence packing (pipeline_ops/packing.py).

Pins: the exclusive prefix sum against a pure-Python fold; bucket-size
invariance (the parallel decomposition must not change the layout);
boundary-spanning docs (end_seq > seq_id); zero-token docs.
"""

from __future__ import annotations

import pytest

from themis_search_engine_spark.pipeline_ops.packing import (
    pack_sequences,
    packed_stats,
    token_counts_raw,
)

DOCS = [
    (0, "a b c d e"),          # 5 tokens
    (1, ""),                    # 0 tokens
    (2, "x " * 7),              # 7 tokens → spans the 8-budget boundary
    (3, "one two three"),       # 3
    (7, "q r s t u v w x y z"),  # 10, gap in ids
]
BUDGET = 8


def _expected():
    lens = {0: 5, 1: 0, 2: 7, 3: 3, 7: 10}
    out, cum = {}, 0
    for d in sorted(lens):
        n = lens[d]
        out[d] = (n, cum, cum // BUDGET, (cum + max(n, 1) - 1) // BUDGET)
        cum += n
    return out


@pytest.fixture(scope="module")
def counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return token_counts_raw(docs).cache()


def test_prefix_sum_and_boundaries(spark, counts):
    got = {
        r.doc_id: (r.n_tokens, r.start_pos, r.seq_id, r.end_seq)
        for r in pack_sequences(counts, budget=BUDGET).collect()
    }
    assert got == _expected()
    # doc 2 starts at pos 5 in seq 0 and ends at pos 11 in seq 1
    assert got[2][2] == 0 and got[2][3] == 1
    # zero-token doc 1: start==doc 0's end, seq span degenerate
    assert got[1] == (0, 5, 0, 0)


@pytest.mark.parametrize("bucket_size", [1, 2, 3, 1000])
def test_bucket_size_invariance(spark, counts, bucket_size):
    got = sorted(
        tuple(r)
        for r in pack_sequences(
            counts, budget=BUDGET, bucket_size=bucket_size
        ).collect()
    )
    want = sorted((d, *v) for d, v in _expected().items())
    assert got == want


def test_packed_stats_rollup(spark, counts):
    stats = {
        r.seq_id: (r.n_docs_starting, r.tokens_starting)
        for r in packed_stats(
            pack_sequences(counts, budget=BUDGET), budget=BUDGET
        ).collect()
    }
    # seq 0: docs 0,1,2 start there (5+0+7 tokens); seq 1: docs 3,7
    assert stats == {0: (3, 12), 1: (2, 13)}


def test_chunk_documents_windows(spark):
    """Window starts/overlap/tail semantics and the empty-doc rule."""
    from themis_search_engine_spark.pipeline_ops.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (2, "only three tokens"),
            (3, "   ,,,   "),  # normalizes to zero tokens
        ],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, size=4, stride=3).collect()
    )
    assert out == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),          # tail window, short
        (2, 0, 3, "only three tokens"),
    ]
    # adjacent windows overlap by size - stride tokens
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=0, stride=3)
