"""Static-rank blended retrieval: BM25 + a query-independent document
score (PageRank), the classic web ranking composition.

The reference computes a citation PageRank (PageRank.java) but no scorer
ever reads it — the blend it declares and never wires (SURVEY.md §2.9
keeps the reference's dead weight-file path unbuilt; THIS module is the
ext operator a web deployment actually wants). Form:

    score'(q, d) = bm25(q, d) + alpha · ln(N · static(d) + 1)

Additive log blending is Lucene's FunctionScoreQuery-in-sum mode and the
form search stacks use for static signals: ``N·static`` centers a
uniform-rank corpus at 1 (so the addend is ~alpha·ln 2 regardless of
corpus size — alpha stays a scale-free knob), the log tames the Zipfian
head (a 100× pagerank hub gains ~alpha·4.6, not 100×), and +1 keeps the
addend at exactly 0 for rank-0 (dangling/unknown) docs.

Scale design (10^12 docs):

* The blend joins on ``doc_id`` AFTER scoring — candidate-bounded, like
  the recency boost (temporal.py): only the batch's candidate docs probe
  the static-rank table, never the corpus.
* The zero-join scale path is the usual denormalization lever: static
  rank is refreshed offline (weekly PageRank job), stamped into postings
  or doc_stats at (re)build, and the blend becomes per-row arithmetic.
* Unlike the recency boost the addend is >= 0, so block-max pruning with
  unblended bounds is NOT sound for the blended rank — the registered
  query therefore blends the exhaustive scored frame. The WAND-sound
  variant adds the corpus max addend to every chunk bound (a constant
  loosening, alpha·ln(N·max_rank + 1)); at typical alpha the envelope
  cost is small because ln is flat across the head.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def static_rank_addend(
    rank_col: Column | str, n_docs: int, alpha: float = 0.5
) -> Column:
    """``alpha · ln(N · rank + 1)`` with missing rank treated as 0."""
    r = F.col(rank_col) if isinstance(rank_col, str) else rank_col
    return F.lit(float(alpha)) * F.log(
        F.lit(float(n_docs)) * F.coalesce(r, F.lit(0.0)) + F.lit(1.0)
    )


def blend_static_rank(
    scored: DataFrame,
    static_rank: DataFrame,
    n_docs: int,
    *,
    alpha: float = 0.5,
    rank_col: str = "pagerank",
) -> DataFrame:
    """(qid, doc_id, score) -> same frame with the statically blended
    score. ``static_rank``: any frame with (doc_id, <rank_col>) — here
    linkgraph.pagerank output; a doc absent from it scores an addend of
    exactly 0 (left join + coalesce), so a graph-ingest gap never drops
    a page from retrieval."""
    sr = static_rank.select("doc_id", rank_col)
    return (
        scored.join(sr, "doc_id", "left")
        .select(
            "qid",
            "doc_id",
            (
                F.col("score")
                + static_rank_addend(rank_col, n_docs, alpha)
            ).alias("score"),
        )
    )
