"""Recency-boosted retrieval over the crawl timestamp.

The input table carries ``warc_ts`` (BASELINE.json input_hint: a
Common-Crawl-style page has a crawl timestamp), but the reference ranks
on text alone (OkapiBM25.java:161-164 — no document-age term anywhere).
Web search wants fresh pages for query-deserves-freshness traffic, and a
training-data pipeline wants recency-weighted sampling; both reduce to
the same primitive: a **deterministic multiplicative time-decay boost**
on the BM25 score.

    boost(doc)  = 2^(-age_days / half_life_days)
    age_days    = (now_ts - warc_ts) / 86400
    score'(q,d) = bm25(q,d) * boost(d)

Exponential half-life decay is the standard form (Elasticsearch's
``exp`` decay, Solr's ``recip`` boost are the same family); base-2 with
a half-life parameter keeps the knob human-readable ("a 30-day-old page
scores half a fresh one").

Scale design (10^12 docs):

* The boost joins on ``doc_id`` AFTER scoring, so it touches only the
  candidate set (bounded by the batch terms' postings via the IN-list
  pushed scan in ``bm25.bm25_score_all``), never the corpus. For a page
  table the join side is a column-pruned (doc_id, warc_ts) scan.
* The zero-join scale path is the same denormalization lever as doc
  length (build.py:106-112): stamp ``warc_ts`` into postings at build
  time and the boost becomes codegen'd per-row arithmetic.
* Block-max WAND stays sound with no metadata change: ages are >= 0 so
  ``boost <= 1``, hence every per-chunk unboosted upper bound still
  bounds the boosted score and theta-pruning never skips a true top-k
  doc. (Pruning power degrades for old chunks; the tightening fix —
  per-chunk max-boost in the block metadata — is a build-time variant
  of compress.py's bound scales.)
* ``now_ts`` is an explicit argument, not ``current_timestamp()``:
  rankings must be reproducible across retries and engines (the same
  determinism rule as every oracled ranking here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recency_boost(
    ts_col: Column | str,
    now_ts: int,
    half_life_days: float = 30.0,
) -> Column:
    """``2^(-age_days / half_life_days)`` with age clamped at >= 0
    (a page "from the future" — clock skew between crawler fleets —
    boosts as fresh, never above 1)."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    age_days = F.greatest(
        (F.lit(now_ts).cast("double") - ts.cast("double")) / F.lit(86400.0),
        F.lit(0.0),
    )
    return F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days)))


def boost_scores(
    scored: DataFrame,
    page_ts: DataFrame,
    now_ts: int,
    half_life_days: float = 30.0,
    *,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(qid, doc_id, score) -> same frame with the recency-decayed score.

    ``page_ts``: any frame with (doc_id, warc_ts) — column-pruned scan of
    the page table. Candidate-bounded: the join runs over the scored
    rows, Catalyst picks broadcast vs sort-merge by the pruned scan's
    stats. Docs missing a timestamp keep their unboosted score (left
    join + coalesce(boost, 1.0)) — a corpus-ingest gap should not zero a
    page out of retrieval.
    """
    ts = page_ts.select("doc_id", ts_col)
    b = recency_boost(ts_col, now_ts, half_life_days)
    return (
        scored.join(ts, "doc_id", "left")
        .select(
            "qid",
            "doc_id",
            (
                F.col("score")
                * F.coalesce(b, F.lit(1.0))
            ).alias("score"),
        )
    )


def bm25_topk_recency(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    page_ts: DataFrame,
    now_ts: int,
    *,
    half_life_days: float = 30.0,
    k: int = 10,
    term_list: list[str] | None = None,
    topk_fn=None,
) -> DataFrame:
    """BM25 top-k with multiplicative recency decay — the full plan:
    IN-list pruned postings scan -> broadcast qterms/dictionary joins ->
    score aggregation -> candidate-bounded boost join -> top-k."""
    from .bm25 import bm25_score_all, topk

    scored = bm25_score_all(
        qterms, postings_flat, dictionary, doc_stats, avgdl,
        term_list=term_list,
    )
    boosted = boost_scores(
        scored, page_ts, now_ts, half_life_days
    )
    return (topk_fn or topk)(boosted, k)
