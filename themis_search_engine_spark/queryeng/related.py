"""Related-term suggestion: PMI-ranked co-occurrence over the match set.

The "related searches" surface: for each query, the terms that co-occur
with its matches far more than chance. Pointwise mutual information
between the query's match set q and a candidate term b:

    pmi(q, b) = log2( df_qb · N / (|match(q)| · df_b) )

where df_qb = #matching docs containing b, df_b = b's corpus df, N = corpus
size. Computed entirely from the index tables (counts + dictionary +
global stats) — no corpus re-scan.

Scale design: the expensive frame is (matching docs ⋈ their terms) —
bounded by |match set| × avgdl, not the corpus; it is keyed on doc_id
(the counts table's natural partitioning), aggregated with map-side
partial counts, then joined to the (broadcastable after term-filter)
dictionary. A min_df floor drops the hapax tail before the join, which
at web scale removes most of the vocabulary from the rollup. The final
per-qid top-n window sorts |candidate terms per qid| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .metadata import matching_docs


def related_terms(
    qterms: DataFrame,
    postings_flat: DataFrame,
    counts: DataFrame,
    dictionary: DataFrame,
    n_docs: int,
    top_n: int = 5,
    *,
    min_df: int = 2,
) -> DataFrame:
    """(qid, term, pmi, rank) — top-n PMI co-occurring terms per query,
    excluding the query's own terms. Deterministic: rounded PMI desc,
    term asc.

    ``counts`` is the per-doc term-count table (A1); co-occurrence is
    document-level (presence, not frequency), matching the classic PMI
    over document sets.
    """
    cand = matching_docs(qterms, postings_flat)
    qsize = cand.groupBy("qid").agg(F.count("*").alias("q_df"))
    co = (
        cand.join(counts.select("doc_id", "term"), "doc_id")
        .groupBy("qid", "term")
        .agg(F.count("*").alias("co_df"))
    )
    own = qterms.select("qid", "term").distinct()
    co = co.join(own, ["qid", "term"], "left_anti")
    df_b = dictionary.select("term", "df").where(F.col("df") >= min_df)
    pmi = (
        co.join(df_b, "term")
        .join(F.broadcast(qsize), "qid")
        .select(
            "qid",
            "term",
            F.round(
                F.log2(
                    F.col("co_df") * F.lit(float(n_docs))
                    / (F.col("q_df") * F.col("df"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("pmi"), F.asc("term"))
    return (
        pmi.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select("qid", "term", "pmi", "rank")
    )
