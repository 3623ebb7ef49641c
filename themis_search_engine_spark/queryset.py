"""Deterministic reference-style query workload (FIXTURES.md §5).

50 queries over the driver testdata vocabulary: mix of 1-5 terms, including
an all-stopword query, an unknown-term query, and head-term queries. No RNG
state — composition is a fixed arithmetic schedule, so every bench and
correctness run sees the identical workload.
"""

from __future__ import annotations

# vocabulary of the driver's documents.parquet corpus (plus a few stopwords
# and unknowns to exercise the drop paths)
_VOCAB = [
    "batch", "small", "scan", "agg", "data", "slow", "join", "customer",
    "big", "hash", "merge", "row", "filter", "table", "stream", "sort",
    "window", "order", "group", "query", "spark", "column", "value",
    "vector", "line", "fast", "key", "dup",
]


def synth_reference_queries(n: int = 300) -> dict[int, str]:
    """Query workload over the SYNTHETIC page corpus vocabulary
    (corpus.VOCAB, Zipf-distributed): mid-frequency terms with a head-term
    ("web") sprinkle — the scaling bench's batch-query mix. The driver-
    testdata workload above matches documents.parquet, NOT this corpus."""
    from .corpus import HEAD_TERM, VOCAB

    out: dict[int, str] = {}
    v = len(VOCAB)
    for i in range(n):
        n_terms = 1 + (i * 3) % 4
        # first term from the mid-frequency band (meaningful df), rest from
        # the full vocab (mostly tail), every 23rd query hits the head term
        terms = [VOCAB[(300 + i * 13) % 1700]]
        for j in range(1, n_terms):
            terms.append(VOCAB[(i * 29 + j * 577) % v])
        if i % 23 == 0:
            terms.append(HEAD_TERM)
        out[i] = " ".join(terms)
    return out


def synth_topical_queries(n: int, topics: int) -> dict[int, str]:
    """Topic-targeted workload over synth_pages(topics=T): query i draws
    2-4 terms from topic (i % T)'s vocab slice — the query shape whose
    relevant docs CONCENTRATE in a topical shard, i.e. the workload
    selective search is designed for (a topic-free query set cannot show
    routing lift no matter how the shards are cut)."""
    from .corpus import TOPIC_BASE, TOPIC_SLICE, VOCAB

    out: dict[int, str] = {}
    for i in range(n):
        t = i % topics
        lo = TOPIC_BASE + t * TOPIC_SLICE
        n_terms = 2 + (i * 3) % 3
        terms = [
            VOCAB[lo + (i * 29 + j * 577) % TOPIC_SLICE]
            for j in range(n_terms)
        ]
        out[i] = " ".join(terms)
    return out


def reference_queries(n: int = 50) -> dict[int, str]:
    out: dict[int, str] = {}
    v = len(_VOCAB)
    for i in range(n):
        if i == 7:
            out[i] = "the and of a"  # all stopwords
            continue
        if i == 23:
            out[i] = "qzxunknown dup"  # unknown term + rare term
            continue
        n_terms = 1 + (i * 3) % 5
        terms = [_VOCAB[(i * 7 + j * 11) % v] for j in range(n_terms)]
        out[i] = " ".join(terms)
    return out
