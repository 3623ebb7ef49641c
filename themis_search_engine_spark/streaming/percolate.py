"""Streaming percolation: match arriving pages against standing queries.

The batch operator (queryeng/percolate.py) is per-document and
stateless, so its streaming twin needs NO state store and NO watermark —
but Structured Streaming forbids aggregations in append mode, so the
per-(doc, qid) ``groupBy`` is re-expressed as **per-row array
arithmetic**: each page's distinct post-pipeline term set is built
in-row (split/filter/array_distinct — narrow, codegen'd), the standing
queries live in a broadcast static frame of (qid, term array, n_req),
and the match count is ``size(array_intersect(doc_terms, q_terms))``.
A stream-static broadcast join in append mode; every micro-batch emits
exactly what the batch operator would (pinned stream≡batch in
tests/test_percolate.py).

Scale: the fan-out before the filter is |pages| x |standing queries|
rows, all narrow — fine for alerting-sized query sets (10^4-10^5; the
broadcast IS the query index). For millions of standing queries, route
first through a term->qid inverted index of the queries (the batch
operator's join shape) inside foreachBatch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textproc import normalize_expr
from ..stopwords import STOPWORDS


def doc_term_set(text_col: str = "text"):
    """Distinct post-pipeline terms of one page as an in-row array —
    the Q9 pipeline (P2 normalize, P3 split, P4 stopwords) without a
    shuffle or an explode."""
    toks = F.split(normalize_expr(F.col(text_col)), r"\s+")
    kept = F.filter(
        toks,
        lambda t: (t != "") & ~t.isin(*sorted(STOPWORDS)),
    )
    return F.array_distinct(kept)


def percolate_stream(
    pages: DataFrame,
    stored_queries: DataFrame,
    *,
    mode: str = "all",
    min_match: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, qid, n_matched) matches for a (possibly streaming) page
    frame. ``stored_queries``: a STATIC (qid, term) frame from the
    standard query pipeline — grouped here into one broadcast row per
    query."""
    if min_match is None and mode not in ("all", "any"):
        raise ValueError(f"percolate_stream: unknown mode {mode!r}")
    qrows = F.broadcast(
        stored_queries.select("qid", "term").distinct()
        .groupBy("qid")
        .agg(
            F.collect_set("term").alias("_qts"),
            F.countDistinct("term").alias("n_req"),
        )
    )
    matched = (
        pages.select(
            F.col(id_col).alias("doc_id"),
            doc_term_set(text_col).alias("_dts"),
        )
        .crossJoin(qrows)
        .select(
            "doc_id", "qid", "n_req",
            F.size(F.array_intersect("_dts", "_qts")).cast("long")
            .alias("n_matched"),
        )
    )
    if min_match is not None:
        cond = F.col("n_matched") >= min_match
    elif mode == "all":
        cond = (F.col("n_matched") == F.col("n_req")) & (F.col("n_req") > 0)
    else:
        cond = F.col("n_matched") >= 1
    return matched.where(cond).select("doc_id", "qid", "n_matched")
