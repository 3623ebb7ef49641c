"""Fielded query syntax: ``lang:en source:news spark shuffle`` — the
Lucene-QueryParser ``field:value`` surface, compiled onto the existing
filtered-retrieval machinery.

The reference's parser takes bare text only (Search.java:41-60); real
query traffic mixes free text with metadata restrictions, and the engine
already has exact filtered retrieval (metadata.bm25_topk_filtered's
refill semantics). This module adds the missing front end plus a
BATCH-heterogeneous execution: each query in a batch may carry a
DIFFERENT filter set, yet the whole batch still runs as ONE plan.

Semantics:
- ``field:value`` tokens (field ∈ ``allowed_fields``) become equality
  restrictions, ANDed together; everything else is the free-text query,
  which goes through the standard Q9 pipeline.
- Scores are the UNRESTRICTED BM25 scores of the matching docs (a doc's
  BM25 score never depends on other candidates, so restricting before
  or after scoring yields identical values; restricting before the
  top-k — never after — keeps the refill contract: k results as long as
  k docs match).

Plan: per-query filters land in a tiny (qid, field, value) frame —
broadcast; doc attributes unpivot to (doc_id, field, value) long form
(a stack projection, no shuffle); the match join + a per-(qid, doc)
count == n_filters(qid) check computes "doc satisfies ALL of qid's
filters" data-driven — no per-query jobs, no codegen'd per-batch plan
explosion. Queries with no filters skip the restriction entirely.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELD_TOKEN = re.compile(r"^(-?)(\w+):(\S+)$")


def parse_fielded(
    query: str, allowed_fields: tuple = ("lang", "source")
) -> tuple:
    """(free_text, [(field, value, negated), ...]). ``-field:value`` is
    Lucene's exclusion form (must NOT match). Unknown-field tokens stay
    in the free text (a colon inside prose must not silently filter);
    values lowercase like every P2-normalized comparison."""
    filters = []
    rest = []
    for tok in query.split():
        m = FIELD_TOKEN.match(tok)
        if m and m.group(2).lower() in allowed_fields:
            filters.append(
                (m.group(2).lower(), m.group(3).lower(), m.group(1) == "-")
            )
        else:
            rest.append(tok)
    return " ".join(rest), filters


def fielded_restriction(
    spark,
    parsed: dict,
    doc_attrs: DataFrame,
    allowed_fields: tuple = ("lang", "source"),
) -> DataFrame | None:
    """(allowed, excluded): ``allowed`` holds (qid, doc_id) pairs
    satisfying ALL of each query's POSITIVE restrictions (None when no
    query has one); ``excluded`` holds (qid, doc_id) pairs matching ANY
    negative restriction (None likewise). Split because a query with
    only exclusions must keep every non-matching doc — a membership
    list of "everything else" would be corpus-sized, the anti-join is
    not. ``parsed`` maps qid -> [(field, value, negated), ...]."""
    rows = [
        (qid, f, v, bool(n))
        for qid, fs in parsed.items() for (f, v, n) in fs
    ]
    if not rows:
        return None, None
    filters = F.broadcast(
        spark.createDataFrame(
            rows, "qid long, field string, value string, neg boolean"
        )
    )
    pos = filters.where(~F.col("neg"))
    n_f = F.broadcast(
        pos.groupBy("qid").agg(F.count("*").alias("_need"))
    )
    long_form = doc_attrs.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(f) for f in allowed_fields]),
                F.array(*[F.lower(F.col(f)) for f in allowed_fields]),
            )
        ).alias("field", "value"),
    )
    allowed = (
        long_form.join(pos.select("qid", "field", "value"),
                       ["field", "value"])
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("_got"))
        .join(n_f, "qid")
        .where(F.col("_got") == F.col("_need"))
        .select("qid", "doc_id")
    ) if rows and any(not r[3] for r in rows) else None
    excluded = (
        long_form.join(
            filters.where(F.col("neg")).select("qid", "field", "value"),
            ["field", "value"],
        )
        .select("qid", "doc_id")
        .distinct()
    ) if any(r[3] for r in rows) else None
    return allowed, excluded


def fielded_topk(
    spark,
    queries: dict,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    doc_attrs: DataFrame,
    k: int = 10,
    *,
    allowed_fields: tuple = ("lang", "source"),
    stem: bool = False,
    round_dp: int | None = None,
) -> DataFrame:
    """(qid, doc_id, score, rank): BM25 top-k with per-query field
    restrictions, one plan for the whole heterogeneous batch."""
    from pyspark.sql.window import Window

    from .bm25 import bm25_score_all
    from .pipeline import qterms_df

    split = {
        qid: parse_fielded(q, allowed_fields) for qid, q in queries.items()
    }
    qt = qterms_df(
        spark, {qid: text for qid, (text, _) in split.items() if text},
        stem=stem,
    )
    scored = bm25_score_all(
        qt, postings_flat, dictionary, doc_stats, avgdl
    )
    allowed, excluded = fielded_restriction(
        spark, {qid: fs for qid, (_, fs) in split.items() if fs},
        doc_attrs, allowed_fields,
    )
    if allowed is not None:
        pos_qids = [
            qid for qid, (_, fs) in split.items()
            if any(not n for (_f, _v, n) in fs)
        ]
        keep_free = scored.where(~F.col("qid").isin(pos_qids))
        keep_restricted = scored.where(
            F.col("qid").isin(pos_qids)
        ).join(allowed, ["qid", "doc_id"], "left_semi")
        scored = keep_free.unionByName(keep_restricted)
    if excluded is not None:
        scored = scored.join(excluded, ["qid", "doc_id"], "left_anti")
    score_key = (
        F.round("score", round_dp) if round_dp is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(score_key), F.asc("doc_id"))
    out_score = (
        F.round("score", round_dp).alias("score")
        if round_dp is not None
        else F.col("score")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", out_score, "rank")
    )
