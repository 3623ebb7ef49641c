"""Pseudo-relevance feedback (Rocchio) query expansion + retrieval.

The third expansion source next to P6 (synonym) and P7 (embedding-NN):
instead of an external resource, the corpus itself supplies expansion
terms — run the query, take the top ``fb_docs`` documents as pseudo-
relevant, lift their highest-weight terms, and re-run the query with
the originals at weight ``alpha`` and the expansion terms at
``1 - alpha`` (Rocchio 1971 / the RM3 interpolation shape; public IR
textbook material — the reference's Search loop has single-pass
expansion only, Search.java:69-78).

Semantics (all deterministic, 6-dp quantized so the DuckDB twin is
value-exact):

* feedback docs: first-pass BM25 rank on round(score, 6) desc,
  doc_id asc, rank <= fb_docs — the repo's standard deterministic
  refinement of Q7's unstable sort;
* expansion weight w(q, t) = Σ_{d ∈ FB(q)} tf(t, d) · idf(t) (Rocchio's
  centroid numerator over the stored max-normalized tf), rounded to
  6 dp; only w > 0 survives (negative-idf head terms make useless
  expansions), originals are excluded; top ``fb_terms`` by (w desc,
  term asc);
* final qterms: originals at alpha · their pipeline qweight, expansion
  at round((1-alpha) · w / max_w(q), 6) — then the standard
  use_qweight=True BM25 plan.

Two Spark jobs by construction (PRF is inherently two-pass). Scale
shape: the first pass is the audited bm25 plan; the feedback set is
|Q|·fb_docs rows (collected — it is the size of one results page), so
the second-pass term lift pushes a doc_id IN-list into the doc-major
counts scan (at cluster scale: the forward-index / counts table
partitioned by doc_id serves k point-lookups per query, the classic
PRF access path) and broadcast-joins the feedback map — no shuffle is
keyed by anything larger than the candidate (qid, term) lift itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .bm25 import TOPK_SALT, bm25_score_all


def _rounded_topk_salted(scored: DataFrame, k: int) -> DataFrame:
    """(qid, doc_id, score, rank) on round(score, 6) desc / doc_id asc —
    the salted two-phase top-k (bm25.topk's shape: no task ever sorts a
    head-term query's full candidate set) with the engine-independent
    rounded ordering the oracle twins rank on."""
    rscore = F.round("score", 6)
    w1 = Window.partitionBy("qid", "salt").orderBy(rscore.desc(), F.asc("doc_id"))
    pre = (
        scored.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(TOPK_SALT)))
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .drop("salt", "_r")
    )
    w2 = Window.partitionBy("qid").orderBy(rscore.desc(), F.asc("doc_id"))
    return (
        pre.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", rscore.alias("score"), "rank")
    )


def prf_qterms(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    *,
    fb_docs: int = 5,
    fb_terms: int = 8,
    alpha: float = 0.5,
) -> DataFrame:
    """(qid, term, qweight) — Rocchio-interpolated query model: the
    original terms at ``alpha`` · pipeline qweight plus the top
    ``fb_terms`` feedback terms at ``(1-alpha)`` · normalized Rocchio
    weight. Feeds bm25_score_all(use_qweight=True)."""
    spark = qterms.sparkSession
    scored1 = bm25_score_all(
        qterms, postings_flat, dictionary, doc_stats, avgdl
    )
    fb_rows = (
        _rounded_topk_salted(scored1, fb_docs)
        .select("qid", "doc_id")
        .collect()
    )
    orig = qterms.select("qid", "term", "qweight")
    if not fb_rows:
        return orig.select(
            "qid", "term", (F.lit(alpha) * F.col("qweight")).alias("qweight")
        )
    fb = F.broadcast(
        spark.createDataFrame(
            [(int(r["qid"]), int(r["doc_id"])) for r in fb_rows],
            "qid long, doc_id long",
        )
    )
    fb_ids = sorted({int(r["doc_id"]) for r in fb_rows})
    # doc-major access: IN-list pushes into the forward/counts scan
    lifted = (
        postings_flat.where(F.col("doc_id").isin(fb_ids))
        .join(fb, "doc_id")
        .join(dictionary.select("term", "idf"), "term")
        .groupBy("qid", "term")
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("_w"))
        .where(F.col("_w") > 0)
    )
    # drop terms already in the query (they keep their original slot)
    lifted = lifted.join(
        F.broadcast(orig.select("qid", "term")), ["qid", "term"], "left_anti"
    )
    wexp = Window.partitionBy("qid").orderBy(F.desc("_w"), F.asc("term"))
    wmax = Window.partitionBy("qid")
    expansion = (
        lifted.withColumn("_rn", F.row_number().over(wexp))
        .where(F.col("_rn") <= fb_terms)
        .withColumn("_maxw", F.max("_w").over(wmax))
        .select(
            "qid",
            "term",
            F.round(
                F.lit(1.0 - alpha) * F.col("_w") / F.col("_maxw"), 6
            ).alias("qweight"),
        )
    )
    return orig.select(
        "qid", "term", (F.lit(alpha) * F.col("qweight")).alias("qweight")
    ).unionByName(expansion)


def prf_topk(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    k: int = 10,
    **prf_kw,
) -> DataFrame:
    """(qid, doc_id, score, rank) — full PRF retrieval: expand via
    :func:`prf_qterms`, score with the weighted BM25 plan, rank on
    round(score, 6) desc / doc_id asc."""
    qx = prf_qterms(
        qterms, postings_flat, dictionary, doc_stats, avgdl, **prf_kw
    )
    scored = bm25_score_all(
        qx, postings_flat, dictionary, doc_stats, avgdl, use_qweight=True
    )
    return _rounded_topk_salted(scored, k)
