"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the correctness baseline.
  Dot products via zip_with + aggregate (native Column lambdas, JVM-side);
  the query side is broadcast (queries ≪ corpus always holds here).
- :func:`ivf_topk` — the scale path: IVF-style partition pruning. Vectors
  are assigned to their nearest centroid (a tiny broadcast table); a query
  probes only the ``n_probe`` nearest centroid cells, so the scored set
  shrinks by ~n_centroids/n_probe. Same scoring expressions → results are
  exact within the probed cells (recall < 1 only from cell pruning, the
  standard IVF trade).
- :func:`cosine_pairs` — all-pairs cosine ≥ tau (embedding near-dup).

Centroids here are picked deterministically (every m-th vector) rather
than by k-means: training an ANN index is out of scope; the *engine*
surface (assignment, probing, pruning, scoring) is what scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embs.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact top-k by cosine.

    One broadcast-nested-loop of |Q|×|corpus| score expressions, then a
    per-query top-k window. Norms are precomputed per side (not per pair).
    Ties broken by vec_id asc for determinism.
    """
    e = with_norm(embs, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"),
        F.col("_norm").alias("_vn"),
    )
    q = with_norm(queries.withColumnRenamed(qvec_col, "embedding"),
                  "embedding").select(
        F.col(qid_col).alias("query_id"), F.col("embedding").alias("_q"),
        F.col("_norm").alias("_qn"),
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        (_dot(F.col("_v"), F.col("_q"))
         / (F.col("_vn") * F.col("_qn"))).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def assign_cells(
    embs: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cid_col: str = "centroid_id",
    cvec_col: str = "centroid_vec",
    n_probe: int = 1,
) -> DataFrame:
    """(id, cell) — nearest-centroid assignment (n_probe nearest for the
    query side). Centroid table is broadcast; ranking is a window over the
    per-id candidate scores. Ties by centroid_id asc (deterministic)."""
    c = with_norm(centroids.withColumnRenamed(cvec_col, "embedding"),
                  "embedding").select(
        F.col(cid_col).alias("cell"), F.col("embedding").alias("_c"),
        F.col("_norm").alias("_cn"),
    )
    e = with_norm(embs, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.col("_norm").alias("_vn"),
    )
    scored = e.crossJoin(F.broadcast(c)).select(
        "_id", "cell",
        (_dot(F.col("_v"), F.col("_c"))
         / (F.col("_vn") * F.col("_cn"))).alias("_cos"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_id").orderBy(F.desc(F.round("_cos", 6)),
                                          F.asc("cell"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_probe)
        .select(F.col("_id"), "cell")
    )


def ivf_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    every_m: int = 50,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """IVF top-k: prune to n_probe cells per query, then exact cosine.

    Centroids = every ``every_m``-th corpus vector (deterministic). At
    scale the corpus side is written partitioned by cell, so probing reads
    only n_probe/n_centroids of the data (partition pruning); here the
    cell filter is the join on the assignment table.
    """
    centroids = embs.where(F.col(id_col) % every_m == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    cells = assign_cells(embs, centroids, vec_col=vec_col, id_col=id_col)
    qcells = assign_cells(
        queries.withColumnRenamed(qvec_col, vec_col)
        .withColumnRenamed(qid_col, id_col),
        centroids, vec_col=vec_col, id_col=id_col, n_probe=n_probe,
    )

    e = with_norm(embs, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"),
        F.col("_norm").alias("_vn"),
    ).join(cells.withColumnRenamed("_id", "vec_id"), "vec_id")
    q = with_norm(queries.withColumnRenamed(qvec_col, "embedding"),
                  "embedding").select(
        F.col(qid_col).alias("query_id"), F.col("embedding").alias("_q"),
        F.col("_norm").alias("_qn"),
    ).join(
        F.broadcast(qcells.withColumnRenamed("_id", "query_id")), "query_id"
    )

    scored = e.join(F.broadcast(q), "cell").select(
        "query_id", "vec_id",
        (_dot(F.col("_v"), F.col("_q"))
         / (F.col("_vn") * F.col("_qn"))).alias("cosine"),
    ).groupBy("query_id", "vec_id").agg(F.max("cosine").alias("cosine"))

    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_pairs(
    embs: DataFrame,
    tau: float = 0.9,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_a, vec_b, cosine) all pairs with cosine >= tau — embedding
    near-dup. All-pairs is the oracle shape; at scale restrict to LSH/IVF
    candidate pairs exactly like jaccard_pairs(candidates=...)."""
    e = with_norm(embs, vec_col)
    a = e.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
                 F.col("_norm").alias("_na"))
    b = e.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
                 F.col("_norm").alias("_nb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            (_dot(F.col("_va"), F.col("_vb"))
             / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= tau)
    )
