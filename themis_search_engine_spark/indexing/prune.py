"""Static index pruning (Carmel et al., SIGIR 2001 — public literature).

Serving indexes at web scale often keep only each term's highest-impact
postings: a head term's list shrinks from ~|corpus| to a constant, the
index gets smaller and faster, and top-k quality degrades gracefully
because the dropped postings are precisely the ones that rarely reach
any top-k. The reference has no pruning (its serving index is the full
index); this is the standard production knob on top of the same tables.

Determinism: postings rank by (tf desc, doc_id asc). tf = cnt/maxcnt is
a single IEEE division of identical integers on every engine, so the
ordering needs no rounding grain.

Scale: a naive per-term window sorts each term's whole posting list in
one task — a head term at 10¹² docs is the wall-clock. Same cure as the
query-side top-k (bm25.topk): salted two-phase ranking, TOPK_SALT× the
parallelism with ≤ salt·per_term rows reaching the final per-term sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queryeng.bm25 import TOPK_SALT


def prune_postings(
    postings_flat: DataFrame, per_term: int = 1000
) -> DataFrame:
    """Postings restricted to each term's top ``per_term`` by impact
    (tf desc, doc_id asc). Schema-preserving: whatever extra columns the
    postings carry (denormalized length, chunk ids) survive pruning."""
    salt = F.pmod(F.col("doc_id"), F.lit(TOPK_SALT))
    w1 = Window.partitionBy("term", "salt").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    pre = (
        postings_flat.withColumn("salt", salt)
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= per_term)
        .drop("salt", "_r")
    )
    w2 = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        pre.withColumn("_r", F.row_number().over(w2))
        .where(F.col("_r") <= per_term)
        .drop("_r")
    )
