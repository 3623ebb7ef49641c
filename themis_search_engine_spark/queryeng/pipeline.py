"""Q9: query pipeline — normalize → tokenize → stopword → stem → weights.

The reference runs this per query on the driver (Search.java:169-199); here
it stays tiny driver-side Python producing a `qterms` DataFrame
``(qid, term, qtf, qweight)`` with qweight = qtf / max_qtf — broadcastable
against the postings table, so ALL queries execute as ONE Spark job
(SURVEY.md §3.2).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession

from ..textproc import tokenize_py


def parse_queries(
    queries: dict[int, str] | list[str], *, stem: bool = True
) -> list[tuple[int, str, int, float]]:
    """→ rows (qid, term, qtf, qweight); distinct terms per qid.

    BM25 consumes distinct terms only (OkapiBM25.java:99-164 iterates query
    terms; the qtf/max_qtf weight feeds VSM, VSM.java:84-99).
    """
    if isinstance(queries, list):
        queries = dict(enumerate(queries))
    rows: list[tuple[int, str, int, float]] = []
    for qid, q in queries.items():
        toks = tokenize_py(q, stem=stem)
        if not toks:
            continue
        cnt = Counter(toks)
        max_qtf = max(cnt.values())
        for term, qtf in sorted(cnt.items()):
            rows.append((int(qid), term, int(qtf), qtf / max_qtf))
    return rows


def query_term_list(
    queries: dict[int, str] | list[str], *, stem: bool = True
) -> list[str]:
    """The batch's distinct processed terms, driver-side — pass as
    ``term_list`` to bm25/wand so the scan-pushdown IN-list needs no
    distinct+collect job over qterms."""
    return sorted({t for _, t, _, _ in parse_queries(queries, stem=stem)})


def query_term_map(
    queries: dict[int, str] | list[str], *, stem: bool = True
) -> dict[int, list[str]]:
    """qid → distinct processed terms, driver-side — the input shape of
    the sharded serving plan (queryeng/sharded.wand_topk_sharded)."""
    out: dict[int, list[str]] = {}
    for qid, term, _, _ in parse_queries(queries, stem=stem):
        out.setdefault(qid, []).append(term)
    return out


def qterms_df(
    spark: SparkSession, queries: dict[int, str] | list[str], *, stem: bool = True
) -> DataFrame:
    rows = parse_queries(queries, stem=stem)
    return spark.createDataFrame(
        rows or [(None, None, None, None)],
        "qid int, term string, qtf int, qweight double",
    ).where("qid is not null")
