"""Q6: existential (boolean OR) model (Existential.java:56-129).

All docs containing ≥1 query term, score 1.0, deterministic doc_id order
instead of the reference's hash-order nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def existential(qterms: DataFrame, postings_flat: DataFrame) -> DataFrame:
    """(qid, doc_id, score=1.0) — a semi-join per query, distinct.

    The batch term set is pushed into the postings scan as a literal
    filter (parquet row-group/dictionary pruning), like bm25_score_all."""
    from .bm25 import MAX_PRUNE_LITERALS

    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        postings_flat = postings_flat.where(F.col("term").isin(terms))
    return (
        postings_flat.join(
            F.broadcast(qterms.select("qid", "term").distinct()), "term"
        )
        .select("qid", "doc_id")
        .distinct()
        .withColumn("score", F.lit(1.0))
    )
