"""Q5: Vector Space Model scorer (VSM.java:65-272; clean-float per §7).

  qw(t)   = (qtf / max_qtf) · log2(N / df)         (VSM.java:84-99)
  dw(t,d) = tf · log2(N / df)                      (VSM.java:130,146)
  score   = Σ qw·dw / (norm_d · norm_q)            (VSM.java:236-253)
  norm_d precomputed at build (A7); norm_q = sqrt(Σ qw²) (VSM.java:188-195)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vsm_score_all(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
) -> DataFrame:
    """(qid, doc_id, score). doc_stats must carry the VSM ``norm`` column
    (build_index(with_norms=True))."""
    from .bm25 import MAX_PRUNE_LITERALS

    # same literal IN-pushdown as bm25_score_all: prune the postings scan
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        postings_flat = postings_flat.where(F.col("term").isin(terms))
    idf_vsm = F.log2(F.lit(float(n_docs)) / F.col("df"))
    qw = (
        qterms.join(dictionary.select("term", "df"), "term")
        .select("qid", "term", (F.col("qweight") * idf_vsm).alias("qw"))
    )
    qnorm = qw.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm")
    )
    q = F.broadcast(qw.join(qnorm, "qid"))
    dw = postings_flat.join(
        dictionary.select("term", "df"), "term"
    ).select("term", "doc_id", (F.col("tf") * idf_vsm).alias("dw"))
    return (
        dw.join(q, "term")
        .groupBy("qid", "doc_id", "qnorm")
        .agg(F.sum(F.col("dw") * F.col("qw")).alias("dot"))
        .join(doc_stats.select("doc_id", "norm"), "doc_id")
        .select(
            "qid",
            "doc_id",
            F.when(
                (F.col("norm") > 0) & (F.col("qnorm") > 0),
                F.col("dot") / (F.col("norm") * F.col("qnorm")),
            ).otherwise(F.lit(0.0)).alias("score"),
        )
    )
