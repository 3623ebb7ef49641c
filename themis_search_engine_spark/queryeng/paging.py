"""Cursor pagination (search-after) and total hit counts.

Two serving-surface staples the reference's Search loop lacks
(Search.java returns one fixed-k page and no result count):

* :func:`total_hits` — the "about N results" number: docs matching at
  least one query term, one combinable count-distinct per query.
* :func:`search_after_topk` — deep pagination the scalable way
  (Elasticsearch's public ``search_after`` design): page N+1 is
  "top-k AFTER the cursor", a predicate on the total order the engine
  already ranks by — (round(score, 6) desc, doc_id asc) — so every
  page costs one top-k, where OFFSET pagination makes page N cost a
  top-(N·k) sort and re-scan. The cursor is the last (score, doc_id)
  of the previous page: stateless, so a 1000-executor serving tier
  needs no per-client scroll state.

Rank-identity with the first page: filtering candidates to
"strictly after the cursor in rank order" then taking the usual
rounded top-k returns EXACTLY ranks k+1..2k of the unfiltered ranking
(the oracle twin states pagination correctness as that equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import bm25_score_all
from .prf import _rounded_topk_salted


def total_hits(qterms: DataFrame, postings_flat: DataFrame) -> DataFrame:
    """(qid, n_hits) — count of docs containing >= 1 query term (the
    OR-semantics candidate count). One IN-pushed scan + one combinable
    count-distinct; queries with no matching term yield no row."""
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    pruned = postings_flat.where(F.col("term").isin(terms)) if terms else postings_flat
    return (
        pruned.join(F.broadcast(qterms.select("qid", "term")), "term")
        .groupBy("qid")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_hits"))
    )


def search_after_topk(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    cursors: dict[int, tuple[float, int]],
    k: int = 10,
) -> DataFrame:
    """(qid, doc_id, score, rank) — the next page after each query's
    cursor. ``cursors``: qid → (score, doc_id) of the previous page's
    LAST row (scores compared at the engine's 6-dp rank grain; pass the
    score a previous page returned and it is already rounded). A qid
    with no cursor gets its FIRST page (cursor = +inf). ``rank``
    restarts at 1 per page — positions are page-relative, the cursor
    carries the global position.
    """
    spark = qterms.sparkSession
    scored = bm25_score_all(qterms, postings_flat, dictionary, doc_stats, avgdl)
    rows = [
        (int(q), float(s), int(d)) for q, (s, d) in sorted(cursors.items())
    ]
    if rows:
        cur = F.broadcast(
            spark.createDataFrame(rows, "qid long, c_score double, c_doc long")
        )
        rs = F.round("score", 6)
        after = (
            F.col("c_score").isNull()
            | (rs < F.col("c_score"))
            | ((rs == F.col("c_score")) & (F.col("doc_id") > F.col("c_doc")))
        )
        scored = (
            scored.join(cur, "qid", "left").where(after).drop("c_score", "c_doc")
        )
    return _rounded_topk_salted(scored, k)
