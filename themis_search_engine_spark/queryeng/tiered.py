"""Tiered retrieval over impact-ordered champion lists: per term, an
index-time "head tier" of the c postings with the largest BM25 tf-side
impact; query time scores ONLY the tier.

Why this exists at web scale: a head term at 10¹² docs has df ~10⁹+ —
even with IN-pushdown and block-max WAND the scan cost of such a term is
df-proportional. Champion lists (the classic impact-ordered top-docs
idea: Anh & Moffat's impact-sorted indexes; Lucene's "top docs by
within-term impact") cap every term's query-time contribution at c rows
REGARDLESS of df, turning worst-case postings I/O from Σ df(t) into
|q|·c. The price is recall below the tier boundary — the standard tiered
serving contract (tier-1 answers most traffic; a miss falls back to the
full index, which in this engine is simply the untiered plans).

Tier membership is deterministic and engine-independent: within a term,
rank postings by round(impact, 6) desc, doc_id asc, keep c, where

    impact = tf·(k1+1) / (tf + k1·(1−b + b·len/avgdl))

— the full BM25 per-(term,doc) part WITHOUT idf. idf is constant within
a term, so for positive-idf terms this IS the BM25-part order; ranking
without idf also keeps the tier meaningful for negative-idf head terms
(it selects the docs where the term is most concentrated, rather than
inverting to the least).

The reference engine has no tiers (its Q2 posting fetch always seeks the
full list, Indexer.java:1588-1601); this is a Spark-first serving
extension over the same postings/doc-stats tables.

Build-side plan: the per-term window is SALTED two-phase (like
bm25.topk) — phase 1 ranks within (term, doc_id%SALT) so no single task
sorts a head term's full df; phase 2 sorts ≤ SALT·c rows per term. Both
phases use the same (impact, doc_id) grain, so the composition is exact.
At 100 TB the tier build is one bounded-output pass over postings, done
once per segment at index time and stored term-bucketed exactly like the
postings it came from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .bm25 import B, K1, TOPK_SALT, bm25_score_all


def impact_expr(avgdl: float, tf=None, length=None):
    """The idf-free BM25 part: tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl))."""
    tf = tf if tf is not None else F.col("tf")
    length = length if length is not None else F.col("length")
    denom = tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * length / F.lit(avgdl))
    return tf * F.lit(K1 + 1.0) / denom


def champion_lists(
    postings_flat: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    c: int = 40,
    *,
    round_dp: int = 6,
) -> DataFrame:
    """Per-term top-c postings by rounded impact — the head tier.

    Output carries the same columns as the input postings (so every
    downstream scorer accepts it unchanged); if the postings don't carry
    a denormalized ``length``, one doc_stats join attaches it (and stays
    attached, so tier queries skip the doc-stats join too).
    """
    p = postings_flat
    if "length" not in p.columns:
        p = p.join(doc_stats.select("doc_id", "length"), "doc_id")
    key = F.round(impact_expr(avgdl), round_dp)
    salt = F.pmod(F.col("doc_id"), F.lit(TOPK_SALT))
    w1 = Window.partitionBy("term", "salt").orderBy(
        F.desc(key), F.asc("doc_id")
    )
    w2 = Window.partitionBy("term").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        p.withColumn("salt", salt)
        .withColumn("r", F.row_number().over(w1))
        .where(F.col("r") <= c)
        .drop("salt", "r")
        .withColumn("r", F.row_number().over(w2))
        .where(F.col("r") <= c)
        .drop("r")
    )


def tiered_topk(
    qterms: DataFrame,
    champions: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    k: int = 10,
    *,
    round_dp: int | None = None,
) -> DataFrame:
    """(qid, doc_id, score, rank): BM25 top-k over the head tier only.

    Scores use the FULL-corpus dictionary and avgdl, summed over the
    (term, doc) pairs that SURVIVED tiering — so a returned score is a
    LOWER BOUND on the doc's untiered score, exact when the doc sits in
    every matched term's tier (always true for single-term queries, and
    for any term with df ≤ c). This is the standard champion-list
    semantics: per-term pruning can drop one term's contribution to a
    doc that another term still surfaces — unlike selective search's
    per-shard routing, where a doc's postings for ALL its terms live in
    the same shard and a routed doc's score is union-exact. A query can
    return fewer than k rows when its terms' tiers are thin — the
    fall-back-to-full-index signal.
    """
    scored = bm25_score_all(qterms, champions, dictionary, doc_stats, avgdl)
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


def tiered_topk_with_fallback(
    qterms: DataFrame,
    champions: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    k: int = 10,
    *,
    round_dp: int | None = None,
) -> DataFrame:
    """Tier-1 serving with the standard fallback: answer from the
    champion tier; any query whose tier yields FEWER than k results
    re-runs on the full postings. This is how tiered engines actually
    serve (tier-1 absorbs most traffic at O(|q|·c) postings; only thin
    queries pay the full-index cost), and it restores the everything-
    the-full-plan-returns guarantee: a fallback query's results are
    exactly bm25 top-k.

    The under-filled check is one count per qid over the tier's ≤ k-row
    output — |queries| rows, collected like qterms itself — and the
    fallback leg runs with ONLY the short queries' qterms, so a batch
    where every query fills from the tier never touches full postings.
    """
    t1 = tiered_topk(
        qterms, champions, dictionary, doc_stats, avgdl, k,
        round_dp=round_dp,
    )
    got = {
        r["qid"]: r["n"]
        for r in t1.groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    all_qids = [r["qid"] for r in qterms.select("qid").distinct().collect()]
    short = [q for q in all_qids if got.get(q, 0) < k]
    filled = t1.where(~F.col("qid").isin(short)) if short else t1
    if not short:
        return filled
    qt_short = qterms.where(F.col("qid").isin(short))
    scored = bm25_score_all(
        qt_short, postings_flat, dictionary, doc_stats, avgdl
    )
    score_key = (
        F.round("score", round_dp) if round_dp is not None else F.col("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(score_key), F.asc("doc_id"))
    out_score = (
        F.round("score", round_dp).alias("score")
        if round_dp is not None
        else F.col("score")
    )
    full = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", out_score, "rank")
    )
    return filled.unionByName(full)
