"""Q4: Okapi BM25 scoring, DataFrame-native (no UDF in the hot path).

Semantics (OkapiBM25.java:66-186, params :68-69, idf :104-107, tf part
:161-164; quirk decisions per SURVEY.md §7):

  idf(t)      = log2((N - df + 0.5) / (df + 0.5))
  part(t, d)  = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  score(q, d) = Σ_{t ∈ q ∩ d} part(t, d)        (bag-of-words OR)
  k1 = 2.0, b = 0.75; tf is the stored max-normalized tf; dl the stored
  int length; ties broken (score desc, doc_id asc) — the deterministic
  refinement of the reference's unstable sort (Q7).

Plan shape: qterms (tiny, broadcast) ⋈ postings → ⋈ doc_stats →
groupBy(qid, doc_id).agg(sum) → per-qid top-k via window. The whole score
expression is Column arithmetic → whole-stage codegen. At cluster scale the
postings side is bucket-partitioned by term so the broadcast-join prunes
buckets; doc_stats joins via sort-merge (or broadcast after top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 2.0
B = 0.75


def bm25_part_expr(tf=None, length=None, idf=None, *, avgdl: float = 1.0):
    tf = tf if tf is not None else F.col("tf")
    length = length if length is not None else F.col("length")
    idf = idf if idf is not None else F.col("idf")
    denom = tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * length / F.lit(avgdl))
    return idf * tf * F.lit(K1 + 1.0) / denom


# above this many distinct batch terms, skip the literal IN-list (a huge
# codegen'd predicate stops helping) and rely on the join alone
MAX_PRUNE_LITERALS = 10_000


def bm25_score_all(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    term_list: list[str] | None = None,
    *,
    use_qweight: bool = False,
) -> DataFrame:
    """(qid, doc_id, score) for every candidate doc of every query —
    one distributed job for the whole query batch.

    The batch's term set is planted into the postings scan as a literal
    IN-filter *before* the broadcast join: Catalyst pushes it into the
    parquet reader (row-group stats + dictionary pruning), so the scan
    reads only matching pages — the Spark analog of the reference's
    vocabulary seek (Indexer.java:1588-1601). Measured 3-4× on the batch
    path vs probing every posting through the broadcast hash table.
    qterms is always driver-built (Q9), so collecting its term set is a
    lookup, not a job.

    If postings carry a denormalized ``length`` column (build_and_save
    writes one), the per-doc doc_stats join — the only wide shuffle in
    this plan — is skipped entirely.

    ``use_qweight=True`` multiplies each term's BM25 part by the qterms
    ``qweight`` column — the expanded-retrieval flow (Search.java:75),
    where expansion terms contribute at reduced weight.
    """
    terms = (
        term_list
        if term_list is not None
        else [r["term"] for r in qterms.select("term").distinct().collect()]
    )
    pruned = postings_flat
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        pruned = postings_flat.where(F.col("term").isin(list(terms)))
    q = F.broadcast(qterms.join(dictionary.select("term", "idf"), "term"))
    joined = pruned.join(q, "term")
    if "length" not in postings_flat.columns:
        joined = joined.join(doc_stats.select("doc_id", "length"), "doc_id")
    part = bm25_part_expr(avgdl=avgdl)
    if use_qweight:
        part = part * F.col("qweight")
    scored = (
        joined.select(
            "qid",
            "doc_id",
            part.alias("part"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("part").alias("score"))
    )
    return scored


TOPK_SALT = 16


def topk(scored: DataFrame, k: int = 10) -> DataFrame:
    """Q8 per qid: rank by (score desc, doc_id asc), take k — in TWO
    salted phases, because a single per-qid window sorts each query's
    whole candidate set in ONE task (a head-term query at web scale has
    ~half the corpus as candidates; that task is the wall-clock).

    Phase 1 ranks within (qid, doc-salt) — TOPK_SALT× the parallelism,
    1/TOPK_SALT the sort size — and keeps k per salt. The global top-k is
    a subset of the union (any doc in the global top-k is in its own
    salt's top-k), so phase 2's window sorts ≤ TOPK_SALT·k rows per qid.
    Exact, deterministic, and the same (score desc, doc_id asc) order.
    """
    salt = F.pmod(F.col("doc_id"), F.lit(TOPK_SALT))
    w1 = Window.partitionBy("qid", "salt").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    pre = (
        scored.withColumn("salt", salt)
        .withColumn("r", F.row_number().over(w1))
        .where(F.col("r") <= k)
        .drop("salt", "r")
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        pre.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", "score", "rank")
    )


def bm25_topk(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    k: int = 10,
    term_list: list[str] | None = None,
) -> DataFrame:
    return topk(
        bm25_score_all(
            qterms, postings_flat, dictionary, doc_stats, avgdl, term_list
        ),
        k,
    )
