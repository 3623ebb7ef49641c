"""Learning-to-rank feature extraction.

The reference ranks by one hand-set formula (OkapiBM25.java:161-164).
Modern web ranking trains a model (LambdaMART/GBDT, neural rerankers)
over per-(query, document) FEATURE VECTORS — and producing those
vectors for training data (query logs x judgments) or for reranking
candidates is itself a corpus-scale engine job. This module emits the
classic lexical feature family from the same index tables the scorers
already read:

  bm25        Okapi BM25 (K1=2, B=0.75 — Q4 semantics)
  n_matched   distinct query terms present in the doc
  coverage    n_matched / |distinct query terms| (unknown terms count
              in the denominator: failing to match them IS signal)
  sum_tf      sum of stored max-normalized tfs over matched terms
  max_tf      max of those tfs
  min_idf     rarest-matched-term signal (min over matched idfs)
  max_idf     most-informative-match signal
  length      stored doc length (A4)

Scale design: everything rides ONE pass over the IN-list-pruned
postings scan — the same candidate-bounded join as ``bm25_score_all``
(broadcast qterms+dictionary, one groupBy(qid, doc_id) computing ALL
aggregates map-side-combinably), then a candidate-bounded doc_stats
join for length and a broadcast per-qid denominator join. Adding a
feature is adding an aggregate expression, not a pass. Downstream
model training consumes the output as a plain DataFrame (pandas
batches into any GBDT library); scoring a trained GBDT back inside
the engine is a vectorized pandas UDF over these same columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .bm25 import MAX_PRUNE_LITERALS, bm25_part_expr


def ltr_features(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    *,
    term_list: list[str] | None = None,
) -> DataFrame:
    """(qid, doc_id, bm25, n_matched, coverage, sum_tf, max_tf,
    min_idf, max_idf, length) for every candidate of every query."""
    terms = (
        term_list
        if term_list is not None
        else [r["term"] for r in qterms.select("term").distinct().collect()]
    )
    pruned = postings_flat
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        pruned = postings_flat.where(F.col("term").isin(list(terms)))
    # denominator: ALL distinct query terms, known or not
    n_q = F.broadcast(
        qterms.select("qid", "term").distinct()
        .groupBy("qid").agg(F.countDistinct("term").alias("_n_q"))
    )
    q = F.broadcast(
        qterms.select("qid", "term").distinct()
        .join(dictionary.select("term", "idf"), "term")
    )
    joined = pruned.join(q, "term")
    if "length" not in postings_flat.columns:
        joined = joined.join(doc_stats.select("doc_id", "length"), "doc_id")
    feats = (
        joined.select(
            "qid", "doc_id", "term", "tf", "idf", "length",
            bm25_part_expr(avgdl=avgdl).alias("part"),
        )
        .groupBy("qid", "doc_id", "length")  # length is constant per doc
        .agg(
            F.sum("part").alias("bm25"),
            F.countDistinct("term").alias("n_matched"),
            F.sum("tf").alias("sum_tf"),
            F.max("tf").alias("max_tf"),
            F.min("idf").alias("min_idf"),
            F.max("idf").alias("max_idf"),
        )
    )
    return feats.join(n_q, "qid").select(
        "qid", "doc_id", "bm25", "n_matched",
        (F.col("n_matched") / F.col("_n_q")).alias("coverage"),
        "sum_tf", "max_tf", "min_idf", "max_idf", "length",
    )


def ltr_rerank_topk(
    features: DataFrame,
    weights: dict[str, float],
    k: int = 10,
    *,
    intercept: float = 0.0,
) -> DataFrame:
    """(qid, doc_id, ltr_score, rank) — apply a LINEAR ranking model
    (weights trained offline on :func:`ltr_features` output + the
    judgments/:func:`hard_negatives` lanes) to rerank each query's
    candidates. This closes the LTR loop end-to-end: feature extraction
    (one grouped pass), model application (ONE codegen projection — the
    dot product is a literal-weighted column sum, no UDF, no model
    server), per-query top-k.

    A linear model is deliberately the engine surface: GBDT/neural
    rerankers plug in by swapping this projection for an Arrow-batched
    pandas UDF over the SAME feature frame — the plan shape (feature
    pass → candidate-bounded rerank → top-k window) is what matters at
    10¹² docs, and it never rescans the corpus. Deterministic: rounded
    score desc, doc_id asc (the house ranking grain). Unknown feature
    names raise rather than silently score 0.
    """
    from pyspark.sql.window import Window

    missing = sorted(set(weights) - set(features.columns))
    if missing:
        raise ValueError(f"ltr_rerank_topk: unknown features {missing}")
    score = F.lit(float(intercept))
    for name in sorted(weights):
        score = score + F.lit(float(weights[name])) * F.col(name)
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("ltr_score", 6)), F.asc("doc_id")
    )
    return (
        features.select(
            "qid", "doc_id", F.round(score, 6).alias("ltr_score")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hard_negatives(
    ranked: DataFrame,
    judgments: DataFrame,
    *,
    per_query: int = 3,
) -> DataFrame:
    """(qid, pos_doc_id, neg_doc_id, neg_rank) — training triples for
    retrieval-model fine-tuning (the DPR/sentence-transformers recipe):
    each judged-relevant doc pairs with the query's ``per_query``
    HIGHEST-RANKED non-relevant results — "hard" negatives, because the
    ranker already scored them above most of the corpus, unlike random
    negatives which are trivially separable. Docs judged relevant are
    excluded from the negative pool; unjudged and judged-irrelevant
    docs both qualify (the standard top-k-minus-positives heuristic —
    some negatives are false, which the literature tolerates).

    Shape: one qid-keyed window picks the negative pool (per_query rows
    per query — a results page, not a corpus slice); the pos × neg
    cross is per-qid and bounded by |positives|·per_query. Queries with
    no judged positive or no surviving negative emit nothing.
    """
    pos = judgments.where(F.col("relevance") == 1).select(
        "qid", F.col("doc_id").alias("pos_doc_id")
    )
    neg_pool = (
        ranked.select("qid", "doc_id", "rank")
        .join(
            judgments.where(F.col("relevance") == 1)
            .select("qid", "doc_id"),
            ["qid", "doc_id"],
            "left_anti",
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc("rank"), F.asc("doc_id"))
    negs = (
        neg_pool.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= per_query)
        .select("qid", F.col("doc_id").alias("neg_doc_id"), "neg_rank")
    )
    return pos.join(negs, "qid").select(
        "qid", "pos_doc_id", "neg_doc_id", "neg_rank"
    )
