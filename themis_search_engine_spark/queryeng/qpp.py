"""Pre-retrieval query-performance prediction (QPP): per-query difficulty
predictors computed from VOCABULARY-LEVEL statistics only — no postings
are scanned, no retrieval runs.

Why this exists at web scale: a serving tier in front of 10³ shards wants
to know, BEFORE spending postings I/O, whether a query is cheap/easy
(rare discriminative terms → small candidate set, selective routing is
safe) or hard (head terms, flat idf profile → broad candidate set, worth
hedging to more shards / the sharded plan / a deeper k). The classic
pre-retrieval predictor family (He & Ounis, SPIRE'04 "Inferring Query
Performance Using Pre-retrieval Predictors"; Zhao, Scholer & Tsegay,
ECIR'08 for SCQ) needs exactly the tables the index already has —
dictionary (df, idf) and collection term frequencies — so prediction is a
|q-vocab|-bounded lookup, the same Q1 shape as the dictionary join in
every scoring plan.

The reference engine has no QPP surface (it is single-index, and its
query pipeline goes straight from parse to score — Search.java:41-88);
this is a Spark-first serving extension on the same statistics its S4
vocabulary sink (Index.java:209-228) already maintains.

Predictors (per qid, over the query's IN-VOCABULARY terms; out-of-
vocabulary terms drop exactly as Q1 drops them from scoring):

- ``n_terms``   — #distinct in-vocab terms (coverage of the query).
- ``avg_idf`` / ``max_idf`` / ``var_idf`` — the idf profile: flat & low →
  head-term query (hard/expensive); any high-idf term → a discriminative
  anchor (easy). var_idf is He & Ounis's σ-idf shape.
- ``avg_ictf``  — avg log2(|C| / cf(t)), inverse collection term
  frequency (He & Ounis avgICTF): like idf but weighted by total
  occurrences, not document incidence.
- ``scq``       — Σ_t (1 + ln cf(t)) · idf(t), the Similarity-of-
  Collection-Query score (Zhao et al.): how much collection mass sits
  behind the query's terms, idf-discounted.

All arithmetic is JVM-side Column expressions; the only aggregation is
one groupBy(qid) over |queries|·|q-vocab| rows. The collection-frequency
lookup filters the counts table to the batch vocabulary FIRST (broadcast
semi-join → IN-pushed scan), so the corpus-sized table contributes a
vocabulary-bounded aggregate, not a full pass per batch — at serving
time cf(t) would be a column of the dictionary (one extra Σ cnt in the
S4 build), which build_index's counts already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_difficulty(
    qterms: DataFrame,
    dictionary: DataFrame,
    counts: DataFrame,
    total_tokens: float | None = None,
    *,
    round_dp: int = 6,
) -> DataFrame:
    """(qid, n_terms, avg_idf, max_idf, var_idf, avg_ictf, scq).

    ``counts`` is the (doc_id, term, cnt) table (InvertedIndex.counts);
    ``total_tokens`` (|C| = Σ cnt) may be passed if the caller already
    has it (global_stats holds n_docs·avgdl = |C| exactly); otherwise
    one combinable aggregate computes it.

    Queries with zero in-vocabulary terms yield no row — the same
    contract as retrieval itself (an all-stopword query returns nothing).
    """
    qv = F.broadcast(qterms.select("qid", "term").distinct())
    if total_tokens is None:
        total_tokens = float(
            counts.agg(F.sum("cnt")).first()[0] or 0.0
        )
    cf = (
        counts.join(qv.select("term").distinct(), "term")
        .groupBy("term")
        .agg(F.sum("cnt").cast("double").alias("cf"))
    )
    per = (
        qv.join(dictionary.select("term", "idf"), "term")
        .join(cf, "term")
        .select(
            "qid",
            "idf",
            F.log2(F.lit(float(total_tokens)) / F.col("cf")).alias("ictf"),
            ((F.lit(1.0) + F.log(F.col("cf"))) * F.col("idf")).alias("scq_t"),
        )
    )
    r = lambda c: F.round(c, round_dp)  # noqa: E731
    return per.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_terms"),
        r(F.avg("idf")).alias("avg_idf"),
        r(F.max("idf")).alias("max_idf"),
        r(F.var_pop("idf")).alias("var_idf"),
        r(F.avg("ictf")).alias("avg_ictf"),
        r(F.sum("scq_t")).alias("scq"),
    )


def route_by_difficulty(
    pred: DataFrame, *, max_idf_threshold: float | None = None
) -> tuple[list, list]:
    """(easy_qids, hard_qids): split a predictor frame for plan routing.

    ``hard`` = queries whose BEST term is still a head term
    (max_idf ≤ threshold): no discriminative anchor exists, the
    candidate set is corpus-scale, and the batch tier should use its
    pruning/sharded plan. ``easy`` queries have at least one rare term
    and the naive IN-pushed plan's candidate set is already small.
    ``max_idf_threshold=None`` splits at the midpoint of the batch's
    min/max predictor (deterministic for a fixed batch, and both routes
    are non-empty whenever the batch has ≥ 2 distinct max_idf values —
    a median split can put everything on one side when the top value
    ties).

    The predictor frame is |queries| rows — collected like qterms
    itself. Queries with no predictor row (no in-vocab terms) are in
    NEITHER list: no plan can return rows for them.
    """
    rows = pred.select("qid", "max_idf").collect()
    if not rows:
        return [], []
    if max_idf_threshold is None:
        vals = [r["max_idf"] for r in rows]
        max_idf_threshold = (min(vals) + max(vals)) / 2.0
    easy = [r["qid"] for r in rows if r["max_idf"] > max_idf_threshold]
    hard = [r["qid"] for r in rows if r["max_idf"] <= max_idf_threshold]
    return easy, hard
