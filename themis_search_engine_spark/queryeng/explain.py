"""Score explanation and cursor pagination — ranked-list serving surface.

Three APIs every production search engine exposes around the ranked
list, absent from the reference (Search.java prints scores only):

* :func:`explain_scores` — the per-term score breakdown (Lucene's
  ``explain``): for chosen (qid, doc_id) pairs, each query term's BM25
  contribution plus the inputs that produced it (tf, df, idf, dl).
  Relevance debugging is reading these rows.
* :func:`search_after` — deep pagination by cursor, not offset: page N+1
  re-ranks only documents strictly after the last (score, doc_id) seen,
  so serving page 1000 costs the same as page 1 (an OFFSET plan sorts
  and skips 1000·k rows — per query, per page).
* :func:`total_hits` — the "about N results" count: docs matching at
  least one query term, one combinable count-distinct per query.

Scale: explain restricts the postings scan with the SAME term IN-list
pushdown the scorer uses, then a broadcast semi-join on the (qid,
doc_id) pairs of interest (pairs are a top-k's worth — driver-sized).
search_after is a codegen'd tuple-comparison filter UNDER the salted
top-k, so pruning happens before any sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import B, K1, bm25_part_expr


def explain_scores(
    qterms: DataFrame,
    pairs: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    term_list: list[str] | None = None,
) -> DataFrame:
    """(qid, doc_id, term, tf, df, idf, length, part) — one row per query
    term matching each requested (qid, doc_id) pair; ``part`` is that
    term's exact additive contribution (Σ part == the scorer's score,
    pinned in tests). ``pairs``: a frame with (qid, doc_id) — typically
    the top-k output."""
    terms = (
        term_list
        if term_list is not None
        else [r["term"] for r in qterms.select("term").distinct().collect()]
    )
    pruned = postings_flat
    if terms:
        pruned = postings_flat.where(F.col("term").isin(list(terms)))
    q = F.broadcast(
        qterms.select("qid", "term").distinct()
        .join(dictionary.select("term", "df", "idf"), "term")
    )
    joined = pruned.join(q, "term").join(
        F.broadcast(pairs.select("qid", "doc_id").distinct()),
        ["qid", "doc_id"],
    )
    if "length" not in postings_flat.columns:
        joined = joined.join(doc_stats.select("doc_id", "length"), "doc_id")
    return joined.select(
        "qid", "doc_id", "term", "tf", "df", "idf", "length",
        bm25_part_expr(avgdl=avgdl).alias("part"),
    )


def search_after(
    scored: DataFrame,
    cursors: DataFrame,
    k: int = 10,
    *,
    grain: int = 6,
) -> DataFrame:
    """(qid, doc_id, score, rank) — the next ``k`` results strictly after
    each query's cursor in the canonical (round(score, grain) desc,
    doc_id asc) order. ``cursors``: (qid, after_score, after_doc_id) —
    the last row of the previous page; ranks continue nothing (they are
    1-based within the page, the page owns its offset).

    The cursor filter is plain Column arithmetic applied BEFORE the
    salted top-k, so each page sorts only the tail — no offset-skip
    sort. Rounds the score to the house 6-dp ordering grain so the
    cursor tuple is engine-stable."""
    from .bm25 import topk

    r = F.round(F.col("score"), grain)
    ra = F.round(F.col("after_score"), grain)
    after = (
        scored.join(F.broadcast(cursors), "qid")
        .where((r < ra) | ((r == ra) & (F.col("doc_id") > F.col("after_doc_id"))))
        .select("qid", "doc_id", "score")
    )
    return topk(after.withColumn("score", r), k)


def total_hits(qterms: DataFrame, postings_flat: DataFrame) -> DataFrame:
    """(qid, n_hits) — the "about N results" number: count of docs
    containing >= 1 query term (the OR-semantics candidate count).
    One IN-pushed postings scan + one map-side-combinable
    count-distinct; queries whose terms all miss yield no row."""
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    pruned = (
        postings_flat.where(F.col("term").isin(terms))
        if terms else postings_flat
    )
    return (
        pruned.join(F.broadcast(qterms.select("qid", "term")), "term")
        .groupBy("qid")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_hits"))
    )
