"""Sequential dependence model: term-proximity-aware ranking.

Metzler & Croft's SDM (SIGIR'05) — the classic proximity upgrade over
bag-of-words ranking, and the standard answer to "hash join" ranking
docs where the two words are adjacent above docs where they are 40
tokens apart (bag-of-words BM25 cannot tell them apart):

    score(q, d) = λ_T · BM25(q, d)
                + λ_O · Σ_pairs log2(1 + count_ordered(a b, d))
                + λ_U · Σ_pairs log2(1 + count_window(a, b, d))

over consecutive query-term pairs (after stopword filtering, the same
query pipeline the unigram leg uses):

* ``count_ordered`` — exact-adjacency occurrences (the #1(a b) feature),
  from the positional index: one (doc_id, pos−1) equi-join per pair;
* ``count_window``  — co-occurrence pairs within an unordered window of
  ``window`` tokens (the #uw8 feature), a per-doc position join bounded
  by tf_a × tf_b;
* the unigram leg is the audited bm25_score_all plan unchanged.

The log2(1+n) dampening replaces the original's Dirichlet LM feature
weighting with the repo's deterministic-arithmetic house style (counts
are integers; log2 is the same libm call BM25's idf already relies on).
Docs matching a pair feature necessarily match both unigrams, so the
proximity legs LEFT-join onto the unigram frame and coalesce to 0 —
SDM never introduces candidates BM25 didn't already score.

Scale shape: the positional scan is pruned to the batch's pair terms
(IN-list pushdown on the persisted positional artifact, exactly
phrase_topk's plan); every join is doc_id-keyed; per-pair counts are
map-side-combinable; no new global structure. Reference Search.java is
bag-of-words only; SDM semantics follow the published model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import bm25_score_all


def _pair_counts(
    pos_index: DataFrame, a: str, b: str, *, window: int
) -> tuple[DataFrame, DataFrame]:
    """((doc_id, c_ord), (doc_id, c_unw)) for one term pair."""
    pa = pos_index.where(F.col("term") == a).select("doc_id", "pos")
    pb = pos_index.where(F.col("term") == b).select(
        "doc_id", F.col("pos").alias("_pb")
    )
    joined = pa.join(pb, "doc_id")
    ordered = (
        joined.where(F.col("_pb") == F.col("pos") + 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    unordered = (
        joined.where(
            (F.col("_pb") != F.col("pos"))
            & (F.abs(F.col("_pb") - F.col("pos")) < window)
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return ordered, unordered


def sdm_score_all(
    spark,
    queries: dict[int, list[str]],
    pos_index: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    *,
    lambdas: tuple[float, float, float] = (0.8, 0.1, 0.1),
    window: int = 8,
) -> DataFrame:
    """(qid, doc_id, score) — SDM scores for a batch of term-list
    queries (already normalized + stopword-filtered; consecutive pairs
    with a == b are skipped, their proximity signal is degenerate)."""
    if not queries:
        raise ValueError("empty queries")
    l_t, l_o, l_u = lambdas
    qt_rows = [
        (int(qid), t, 1.0)
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    ]
    qterms = spark.createDataFrame(
        qt_rows, "qid long, term string, qweight double"
    )
    uni = bm25_score_all(
        qterms, postings_flat, dictionary, doc_stats, avgdl
    ).select("qid", "doc_id", F.col("score").alias("_st"))

    pair_terms = sorted({
        t
        for terms in queries.values()
        for pair in zip(terms, terms[1:])
        for t in pair
        if pair[0] != pair[1]
    })
    ord_legs: list[DataFrame] = []
    unw_legs: list[DataFrame] = []
    if pair_terms:
        pruned = pos_index.where(F.col("term").isin(pair_terms))
        for qid, terms in sorted(queries.items()):
            for a, b in zip(terms, terms[1:]):
                if a == b:
                    continue
                o, u = _pair_counts(pruned, a, b, window=window)
                lit = F.lit(int(qid)).cast("long").alias("qid")
                ord_legs.append(o.select(lit, "doc_id", "c"))
                unw_legs.append(u.select(lit, "doc_id", "c"))

    def _leg_sum(legs: list[DataFrame], name: str) -> DataFrame | None:
        if not legs:
            return None
        allc = legs[0]
        for leg in legs[1:]:
            allc = allc.unionByName(leg)
        return allc.groupBy("qid", "doc_id").agg(
            F.sum(F.log2(F.col("c") + 1.0)).alias(name)
        )

    out = uni
    so = _leg_sum(ord_legs, "_so")
    su = _leg_sum(unw_legs, "_su")
    if so is not None:
        out = out.join(so, ["qid", "doc_id"], "left")
    else:
        out = out.withColumn("_so", F.lit(None).cast("double"))
    if su is not None:
        out = out.join(su, ["qid", "doc_id"], "left")
    else:
        out = out.withColumn("_su", F.lit(None).cast("double"))
    return out.select(
        "qid", "doc_id",
        (
            F.lit(l_t) * F.col("_st")
            + F.lit(l_o) * F.coalesce("_so", F.lit(0.0))
            + F.lit(l_u) * F.coalesce("_su", F.lit(0.0))
        ).alias("score"),
    )
