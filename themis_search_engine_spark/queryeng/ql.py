"""Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty).

The third classic scorer next to Q4 BM25 and Q5 VSM (reference
Search.java has neither): rank by the probability the document's
language model generates the query,

    score(q, d) = Σ_{t ∈ q} log2( (tf_td + μ·P(t|C)) / (dl_d + μ) )

with P(t|C) = cf_t / |C| (collection-frequency MLE) and μ the Dirichlet
pseudo-count (μ=2000, the published default). Absent terms still
contribute their smoothed mass, which naïvely makes every corpus doc a
candidate; the standard decomposition restores sparsity:

    score = Σ_{t: tf>0} [ log2(tf + μP_t) − log2(μP_t) ]   (present part)
          + Σ_{t ∈ q} log2(μP_t)                            (per-query C_q)
          − |q| · log2(dl + μ)                              (length part)

so candidates are exactly the docs matching ≥ 1 query term (the same OR
candidate set every scorer here uses), scored over RAW counts (A1) and
raw doc length (A4) — QL's tf is not max-normalized. Query terms with
no collection occurrence (OOV or stopworded) drop from the sum on both
engines, mirroring Lucene's LMDirichletSimilarity.

Scale shape: cf is ONE IN-pushed aggregate over the counts table
(bounded by the batch vocabulary); |C| is a broadcast 1-row sum; the
per-query constants are a broadcast |Q|-row frame; the scoring join is
the audited counts-side OR plan keyed on (qid, doc_id). Scores are
negative log-probabilities-per-query — larger (closer to 0) is better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ql_score_all(
    spark,
    queries: dict[int, list[str]],
    counts: DataFrame,
    doc_stats: DataFrame,
    *,
    mu: float = 2000.0,
) -> DataFrame:
    """(qid, doc_id, score) — Dirichlet query-likelihood scores for a
    batch of term-list queries (normalized tokens; duplicates within a
    query collapse to the term set)."""
    if not queries:
        raise ValueError("empty queries")
    q = F.broadcast(
        spark.createDataFrame(
            sorted({
                (int(qid), t)
                for qid, terms in queries.items()
                for t in terms
            }),
            "qid long, term string",
        )
    )
    all_terms = sorted({t for terms in queries.values() for t in terms})
    cf = (
        counts.where(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(F.sum("cnt").cast("double").alias("cf"))
    )
    total = doc_stats.agg(
        F.sum("length").cast("double").alias("_t")
    )
    qp = (
        q.join(cf, "term")  # inner: zero-cf terms drop on both engines
        .crossJoin(F.broadcast(total))
        .select(
            "qid", "term",
            (F.col("cf") / F.col("_t")).alias("_p"),
        )
    )
    consts = qp.groupBy("qid").agg(
        F.sum(F.log2(F.lit(mu) * F.col("_p"))).alias("_cq"),
        F.count("*").cast("long").alias("_nq"),
    )
    present = (
        counts.where(F.col("term").isin(all_terms))
        .join(q, "term")
        .join(qp.select("qid", "term", "_p"), ["qid", "term"])
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(
                F.log2(F.col("cnt") + F.lit(mu) * F.col("_p"))
                - F.log2(F.lit(mu) * F.col("_p"))
            ).alias("_sp")
        )
    )
    return (
        present.join(doc_stats.select("doc_id", "length"), "doc_id")
        .join(F.broadcast(consts), "qid")
        .select(
            "qid", "doc_id",
            (
                F.col("_sp") + F.col("_cq")
                - F.col("_nq") * F.log2(F.col("length") + F.lit(mu))
            ).alias("score"),
        )
    )
