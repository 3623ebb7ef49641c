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

Centroids default to a deterministic pick (every m-th vector) so the
driver oracle can replicate them in SQL; :func:`kmeans_centroids` offers
an equally deterministic Lloyd refinement (no RNG: data-arithmetic init,
id-asc tie-breaks, exact mean aggregates) for better-balanced cells —
the *engine* surface (assignment, probing, pruning, scoring) is the same
either way.
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


def filtered_cosine_topk(
    embs: DataFrame,
    queries: DataFrame,
    predicate,
    k: int = 5,
    **kwargs,
) -> DataFrame:
    """Metadata-filtered vector search: exact cosine top-k over only the
    corpus vectors satisfying ``predicate`` (a Column over ``embs``).

    The filter restricts BEFORE scoring — filtered search refills with
    the next-best matching vectors, never post-filters an unfiltered
    top-k to < k rows (the same semantics as metadata.bm25_topk_filtered
    on the text side). The predicate lands on the embeddings scan
    (PushedFilters / partition pruning when the corpus is written
    partitioned by the attribute); everything downstream — norms,
    broadcast-NL scoring, the top-k window — sees only survivors, so a
    selective filter makes the search cheaper, not just smaller.
    At IVF scale, apply the predicate before :func:`ivf_topk` the same
    way; with the corpus written partitioned by (attr, cell) both the
    attribute filter and the n_probe cell pruning become partition
    pruning on one scan.
    """
    return cosine_topk(embs.where(predicate), queries, k=k, **kwargs)


def ann_recall(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """(query_id, n_hit, recall) — per-query recall@k of an approximate
    top-k against the exact one: |approx ∩ exact| / k. The measurement a
    deployment runs before trusting an ANN index config (n_probe,
    centroid count, quantization) — recall here is a first-class oracled
    output, not a prose claim.

    Both inputs are top-k frames ((query_id, vec_id, ...), ≤ k rows per
    query), so everything is |Q|·k-sized: the intersection join, the
    groupBy, the left join that keeps zero-hit queries visible as
    recall=0 rows (dropping them would overstate macro recall). Nothing
    touches the corpus — at 100 TB this runs over two small result
    frames regardless of index size.
    """
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n = F.coalesce("n_hit", F.lit(0)).cast("long")
    return (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            n.alias("n_hit"),
            F.round(n / F.lit(float(k)), 6).alias("recall"),
        )
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


def kmeans_centroids(
    embs: DataFrame,
    *,
    every_m: int = 50,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grain: int | None = None,
    init: DataFrame | None = None,
) -> DataFrame:
    """(centroid_id, centroid_vec) — deterministic Lloyd refinement of the
    every-m-th-vector IVF init (no RNG anywhere: init is data arithmetic,
    assignment ties break on centroid_id asc, means are exact aggregates).

    ``init``: optional explicit seed table (centroid_id, centroid_vec)
    replacing the every_m rule — for callers whose id space is not dense
    (e.g. topical.topical_shard_map seeding k exact centroids from a
    re-ranked training sample: the modulo rule intersected with a
    sampled id space can silently drop seeds and collapse the
    clustering). Semantics otherwise identical.

    Per iteration: one broadcast nearest-centroid assignment + one
    (cell, pos) mean shuffle — both linear in corpus size; lineage is
    bounded per round (localCheckpoint) like pagerank/connected-components.
    A cell that loses all members keeps its previous centroid (no
    re-seeding, which would need RNG). ``iters`` is small (2-5): IVF wants
    balanced cells, not converged k-means.

    ``grain``: if set, each mean element is quantized to that many decimal
    places via floor(x·10^g + 0.5)/10^g between iterations — the
    engine-independence grain (floor is defined identically everywhere;
    avg's summation order is not), making the WHOLE training chain
    bit-reproducible across engines/partitionings: iteration i+1's
    assignments read quantized means, so a last-ulp avg difference can
    never flip a cell. The oracled registry entry trains at grain=6;
    production callers that don't need cross-run bit-equality leave None.
    """
    if init is not None:
        cents = init.select(
            "centroid_id",
            F.transform("centroid_vec", lambda x: x.cast("double")).alias(
                "centroid_vec"
            ),
        )
    else:
        cents = embs.where(F.col(id_col) % every_m == 0).select(
            F.col(id_col).alias("centroid_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias(
                "centroid_vec"
            ),
        )
    vecs = embs.select(
        F.col(id_col).alias("_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    scale = F.lit(float(10 ** grain)) if grain is not None else None
    mean_expr = F.avg("val")
    if scale is not None:
        mean_expr = F.floor(mean_expr * scale + F.lit(0.5)) / scale
    for _ in range(int(iters)):
        cells = assign_cells(vecs, cents, vec_col="_v", id_col="_id")
        means = (
            vecs.join(cells, "_id")
            .select("cell", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(mean_expr.alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pv")
            )
            .select(
                F.col("cell").alias("centroid_id"),
                F.transform("pv", lambda s: s.getField("m")).alias(
                    "centroid_vec"
                ),
            )
        )
        cents = means.unionByName(
            cents.join(means.select("centroid_id"), "centroid_id",
                       "left_anti")
        ).localCheckpoint(eager=False)
    return cents


def label_centroids(
    embs: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    labeled=None,
) -> DataFrame:
    """(label, centroid_vec) — per-label mean vectors from a labeled
    subset (``labeled``: a Column predicate selecting the training rows;
    None = every row). One (label, pos) shuffle, linear in the labeled
    set; exact mean aggregates, no RNG."""
    src = embs.where(labeled) if labeled is not None else embs
    return (
        src.select(
            F.col(label_col).alias("label"),
            F.posexplode(
                F.transform(vec_col, lambda x: x.cast("double"))
            ).alias("pos", "val"),
        )
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pv"))
        .select(
            "label",
            F.transform("pv", lambda s: s.getField("m")).alias(
                "centroid_vec"
            ),
        )
    )


def centroid_classify(
    embs: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, pred_label, cosine) — nearest-centroid (Rocchio)
    classification: argmax cosine over the broadcast centroid table.

    The domain/quality/topic classifier a training pipeline runs over
    the whole corpus: |labels| is tiny, so the centroid table broadcasts
    and classification is ONE narrow pass (crossJoin fan-out = |labels|
    per row, all codegen zip_with/aggregate arithmetic — no shuffle
    beyond the per-vector argmax window, which partitions on the id).
    Deterministic: rank on 6-dp-rounded cosine, label-asc tiebreak."""
    from pyspark.sql.window import Window

    c = F.broadcast(
        centroids.select("label", "centroid_vec")
    )
    v = embs.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    scored = v.crossJoin(c).select(
        "vec_id",
        F.col("label").alias("pred_label"),
        (_dot(F.col("_v"), F.col("centroid_vec"))
         / (_norm(F.col("_v")) * _norm(F.col("centroid_vec")))
         ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("pred_label")
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("vec_id", "pred_label", "cosine")
    )


def centroid_classify_arrow(
    embs: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`centroid_classify`, Arrow-kernel physical plan — decision-
    identical (pinned in tests), ~two orders faster on wide vectors.

    The Catalyst form evaluates |labels|·dim interpreted higher-order-
    function ops per row; at corpus scale (topical sharding classifies
    EVERY doc) that arithmetic dominates the whole assignment. This twin
    collects the tiny centroid table once (same bound as the broadcast),
    ships it in the task closure, and scores each Arrow batch as ONE
    numpy matmul; the argmax reproduces the Catalyst ranking exactly —
    half-away-from-zero 6-dp rounding (Spark ROUND) then label-asc ties.
    No shuffle at all (the Catalyst form pays a per-vector argmax
    window); output cosine is the raw float, as there.
    """
    import numpy as np
    import pandas as pd

    cents = sorted(
        (r["label"], [float(x) for x in r["centroid_vec"]])
        for r in centroids.select("label", "centroid_vec").collect()
    )
    labels = [c[0] for c in cents]
    C = np.array([c[1] for c in cents], dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))

    id_t = embs.schema[id_col].dataType.simpleString()
    lab_t = centroids.schema["label"].dataType.simpleString()
    schema = f"vec_id {id_t}, pred_label {lab_t}, cosine double"

    def classify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            vnorm = np.sqrt((V * V).sum(axis=1))
            # dot / (|v|·|c|) — the same shape as the Catalyst
            # expression; dust-level sum-order differences sit far below
            # the 6-dp decision grain
            cos = (V @ C.T) / np.maximum(
                vnorm[:, None] * cnorm[None, :], 1e-300
            )
            # Spark ROUND = half away from zero; np.round is banker's
            r6 = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
            # argmax on rounded cosine, label-asc ties: labels are sorted
            # ascending, np.argmax takes the FIRST max — exactly the tie
            best = np.argmax(r6, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "pred_label": [labels[i] for i in best],
                "cosine": cos[np.arange(len(best)), best],
            })

    v = embs.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    return v.mapInPandas(classify, schema)


def quantize_embeddings(
    embs: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, qvec, scale): symmetric per-vector int8 quantization —
    scale = max|x|/127, qvec[i] = floor(x/scale + 0.5).

    The 100 TB ANN memory lever: 4x fewer bytes per float32 corpus (8x
    vs these double fixtures), so 4x more of the index fits in executor
    memory / page cache, and the approximate dot runs on small ints.
    floor(x + 0.5) instead of round(): both engines define floor
    identically (round() half-even vs half-away differs), so the
    quantized vectors are BIT-identical between Spark and the DuckDB
    twin — quantization introduces approximation, never nondeterminism.
    All codegen; no shuffle."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    # ONE scale expression reused for both outputs so qvec[i]*scale
    # inverts exactly what was quantized (and the DuckDB twin replicates
    # the identical float op sequence: greatest -> /127 -> x/scale+0.5)
    scale = F.greatest(mx, F.lit(1e-30)) / F.lit(127.0)
    return embs.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        ).alias("qvec"),
        scale.alias("scale"),
    )


def quantized_topk(
    qembs: DataFrame,
    embs: DataFrame,
    query_vecs: DataFrame,
    *,
    k: int = 5,
    refine: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — two-phase ANN: approximate
    dot over the int8 table selects refine*k candidates per query, then
    the TRUE cosine is computed only for candidates (a point-join back
    to the full-precision table) and ranked. The returned scores are
    exact; quantization affects only which candidates are considered —
    the standard product quantization serving shape (coarse scan cheap
    and cache-resident, exact math on k*refine rows)."""
    from pyspark.sql.window import Window

    qq = quantize_embeddings(
        query_vecs, vec_col="query_vec", id_col="query_id"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("_qq"),
        F.col("scale").alias("_qs"),
    )
    # int dot (|q| <= 127, so dim 64 stays far below 2^31) scaled back
    approx = qembs.crossJoin(F.broadcast(qq)).select(
        "query_id", "vec_id",
        (
            F.aggregate(
                F.zip_with(
                    "qvec", "_qq",
                    lambda a, b: (a * b).cast("long"),
                ),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).cast("double") * F.col("scale") * F.col("_qs")
        ).alias("adot"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("adot", 6)), F.asc("vec_id")
    )
    cand = (
        approx.withColumn("_r", F.row_number().over(wa))
        .where(F.col("_r") <= k * refine)
        .select("query_id", "vec_id")
    )
    # exact rescore: point join into the full-precision vectors
    full = embs.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
    )
    qfull = F.broadcast(query_vecs.select(
        "query_id",
        F.transform("query_vec", lambda x: x.cast("double")).alias("_q"),
    ))
    scored = (
        cand.join(full, "vec_id")
        .join(qfull, "query_id")
        .select(
            "query_id", "vec_id",
            (_dot(F.col("_v"), F.col("_q"))
             / (_norm(F.col("_v")) * _norm(F.col("_q")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    every_m: int = 50,
    n_probe: int = 2,
    train_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """IVF top-k: prune to n_probe cells per query, then exact cosine.

    Centroids = every ``every_m``-th corpus vector (deterministic);
    ``train_iters > 0`` refines them with :func:`kmeans_centroids`
    (deterministic Lloyd — better-balanced cells, still no RNG). The
    driver-oracled registry entry runs train_iters=0, whose centroid
    arithmetic the DuckDB twin replicates exactly; the trained variant is
    pinned by pytest (determinism + a recall floor vs brute force — Lloyd
    optimizes quantization error, so per-query-set recall is not strictly
    monotone in iterations). At
    scale the corpus side is written partitioned by cell, so probing reads
    only n_probe/n_centroids of the data (partition pruning); here the
    cell filter is the join on the assignment table.
    """
    if train_iters:
        centroids = kmeans_centroids(
            embs, every_m=every_m, iters=train_iters,
            vec_col=vec_col, id_col=id_col,
        )
    else:
        centroids = embs.where(F.col(id_col) % every_m == 0).select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
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
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= tau — embedding near-dup.

    With ``candidates`` (vec_a, vec_b) the pair enumeration itself is
    candidate-bounded: the candidate list joins the embedding table twice
    (on vec_a, then vec_b) BEFORE any cosine is computed, so work is
    O(|candidates|). Without, it is the all-pairs crossJoin — the
    small-scale oracle shape only; :func:`srp_lsh_pairs` is the scale path.
    """
    e = with_norm(embs, vec_col)
    a = e.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
                 F.col("_norm").alias("_na"))
    b = e.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
                 F.col("_norm").alias("_nb"))
    if candidates is not None:
        pairs = (
            candidates.select("vec_a", "vec_b").distinct()
            .join(a, "vec_a").join(b, "vec_b")
        )
    else:
        pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b",
            (_dot(F.col("_va"), F.col("_vb"))
             / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= tau)
    )


# ---------------------------------------------------------------------------
# SRP (random-hyperplane) LSH: the scale path for embedding near-dup
# ---------------------------------------------------------------------------


def srp_signs(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane components: +1 iff the first hex digit
    of md5('{plane}|{d}') < 8. No RNG — the same construction is emitted
    as literals into the DuckDB oracle SQL, so both engines agree bit-for-
    bit (the MinHash seeded-md5 trick, applied to Charikar SRP)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[0], 16) < 8
        else -1.0
        for d in range(dim)
    ]


def srp_signature(
    embs: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, srp: long) — n_planes-bit sign signature. Bit i is 1 iff
    v · h_i >= 0 (Charikar 2002: P[bit match] = 1 - angle/π). Each dot is a
    zip_with/aggregate over a literal ±1 array — pure codegen, one narrow
    pass, no shuffle.

    A vector whose length differs from ``dim`` fails LOUDLY (raise_error,
    plan-side — no driver action): zip_with would otherwise null-pad the
    shorter side, the dot would aggregate to null, and every bit would
    silently fall through to 0, gutting LSH recall."""
    sig = None
    for i in range(n_planes):
        signs = F.array(*[F.lit(s) for s in srp_signs(i, dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), signs,
                       lambda x, s: x.cast("double") * s),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    guarded = F.when(F.size(F.col(vec_col)) == dim, sig).otherwise(
        F.raise_error(F.concat(
            F.lit(f"srp_signature: expected {dim}-dim vector, got "),
            F.size(F.col(vec_col)).cast("string"),
        ))
    )
    return embs.select(F.col(id_col).alias("vec_id"), guarded.alias("srp"))


def srp_lsh_candidates(
    embs: DataFrame,
    *,
    n_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_a, vec_b) undirected candidate pairs (vec_a < vec_b) from
    banded SRP signatures — the candidate-generation half of
    :func:`srp_lsh_pairs`, reusable by any vector table (document
    embeddings, derived term vectors). A band-keyed linear shuffle."""
    r = n_planes // bands
    assert bands * r == n_planes, "n_planes must be divisible by bands"
    sigs = srp_signature(embs, n_planes, dim, vec_col=vec_col, id_col=id_col)
    mask = (1 << r) - 1
    banded = sigs.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("srp"), b * r)
                .bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    left = banded.select("band", "key", F.col("vec_id").alias("vec_a"))
    right = banded.select("band", "key", F.col("vec_id").alias("vec_b"))
    return (
        left.join(right, ["band", "key"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def srp_lsh_pairs(
    embs: DataFrame,
    tau: float = 0.4,
    *,
    n_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_a, vec_b, cosine) near-dup pairs via banded SRP LSH + exact
    cosine verify — the 100 TB path for embedding near-dup.

    Banding: r = n_planes/bands bits per band; candidate iff some band's
    bits all match. P[candidate] = 1-(1-p^r)^bands with p = 1-θ/π; at
    tau=0.4 (θ≈66°), r=2, bands=8 → ~0.98 recall; precision is exact
    because the verify computes true cosine over candidates only (the
    candidate restriction is applied BEFORE pair enumeration — see
    cosine_pairs). Candidate generation is a band-keyed linear shuffle,
    mirroring minhash_lsh_pairs/simhash_pairs.
    """
    cand = srp_lsh_candidates(
        embs, n_planes=n_planes, bands=bands, dim=dim,
        vec_col=vec_col, id_col=id_col,
    )
    return cosine_pairs(
        embs, tau, vec_col=vec_col, id_col=id_col, candidates=cand
    )


def knn_join(
    embs: DataFrame,
    k: int = 5,
    *,
    n_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    exact: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, neighbor_id, cosine, rank) — every vector's k nearest
    same-table neighbors by exact cosine: the kNN-graph primitive
    (semantic-dedup clustering over similarity edges, NSW/HNSW graph
    construction, per-cluster diversity audits).

    Default path (the 100 TB shape): undirected SRP-banded candidates
    (:func:`srp_lsh_candidates`, one linear band-keyed shuffle) opened
    into BOTH orientations — each side of a candidate pair is a
    potential neighbor OF the other — then exact cosine over candidates
    only and a per-vector top-k window (WindowGroupLimit: map tasks
    pre-select k per vector, a hub vector's candidate list never sorts
    in one task). ``exact=True`` is the all-pairs twin (O(n²) crossJoin)
    — the small-scale oracle shape only, exactly the
    cosine_pairs/srp_lsh_pairs split.

    Recall caveat (same class as every LSH path here): a true neighbor
    sharing no band with its vector is missed, so ranks are within the
    candidate set; a vector with zero candidates emits no rows (its
    neighborhood is unreported, not claimed empty). The registered
    driver query replicates the banding bit-for-bit in DuckDB, so both
    engines agree even where recall < 1.
    """
    e = with_norm(embs, vec_col)
    a = e.select(F.col(id_col).alias("vec_id"),
                 F.col(vec_col).alias("_va"), F.col("_norm").alias("_na"))
    b = e.select(F.col(id_col).alias("neighbor_id"),
                 F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb"))
    if exact:
        pairs = a.crossJoin(b).where(
            F.col("vec_id") != F.col("neighbor_id")
        )
    else:
        und = srp_lsh_candidates(
            embs, n_planes=n_planes, bands=bands, dim=dim,
            vec_col=vec_col, id_col=id_col,
        )
        directed = und.select(
            F.col("vec_a").alias("vec_id"),
            F.col("vec_b").alias("neighbor_id"),
        ).unionByName(und.select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("neighbor_id"),
        ))
        pairs = directed.join(a, "vec_id").join(b, "neighbor_id")
    from pyspark.sql.window import Window

    scored = pairs.select(
        "vec_id", "neighbor_id",
        (_dot(F.col("_va"), F.col("_vb"))
         / (F.col("_na") * F.col("_nb"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id",
                F.round("cosine", 6).alias("cosine"), "rank")
    )


def rrf_fuse(
    text_ranked: DataFrame,
    vec_ranked: DataFrame,
    k: int = 10,
    *,
    k_rrf: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
    vector (cosine ANN) ranking — the standard way a training-data /
    search stack combines the index this engine builds with the
    embedding lanes above. rrf(d) = Σ_side 1/(k_rrf + rank_side(d)), a
    missing side contributing 0 (Cormack & Clarke's RRF, k_rrf=60).

    Inputs are (qid, doc_id, rank) frames — any of the engine's top-k
    outputs qualify. Fusing on RANKS (not scores) makes the fusion
    scale-free, and because both inputs already rank on ROUNDED scores
    with doc_id tiebreaks, the fused ranking is engine-deterministic.
    Both inputs are tiny (≤ |Q|·k rows), so the join and window are
    trivially broadcastable at any corpus scale.
    """
    t = text_ranked.select(
        "qid", "doc_id", F.col("rank").alias("_trank")
    )
    v = vec_ranked.select("qid", "doc_id", F.col("rank").alias("_vrank"))
    fused = t.join(v, ["qid", "doc_id"], "full_outer").select(
        "qid", "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(k_rrf) + F.col("_trank")), F.lit(0.0))
            + F.coalesce(
                1.0 / (F.lit(k_rrf) + F.col("_vrank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def combmnz_fuse(
    text_scored: DataFrame,
    vec_scored: DataFrame,
    k: int = 10,
    *,
    mnz: bool = True,
) -> DataFrame:
    """Score-based hybrid fusion — CombSUM / CombMNZ (Fox & Shaw,
    TREC-2 1994) beside :func:`rrf_fuse`'s rank-based lane: each side's
    scores are min-max normalized to [0,1] PER QUERY, summed, and (for
    CombMNZ, the default) multiplied by the number of lanes that matched
    the doc — rewarding agreement, the reason MNZ usually edges SUM on
    web collections.

    Inputs are (qid, doc_id, score) frames — the engine's ROUNDED top-k
    outputs (score already at the 6-dp grain), so the normalization
    arithmetic runs over identical doubles on every engine and the
    result is deterministic. A lane whose scores are constant for a qid
    (max == min, e.g. a single hit) normalizes to 1.0, not 0/0. Both
    inputs are ≤ |Q|·k rows: every window and the full-outer join are
    trivially small at any corpus scale.
    """
    from pyspark.sql.window import Window

    def _norm_lane(df: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("qid")
        s = F.col("score")
        mn, mx = F.min(s).over(w), F.max(s).over(w)
        return df.select(
            "qid", "doc_id",
            F.round(
                F.when(mx == mn, F.lit(1.0)).otherwise((s - mn) / (mx - mn)),
                6,
            ).alias(out),
        )

    t = _norm_lane(text_scored.select("qid", "doc_id", "score"), "_tn")
    v = _norm_lane(vec_scored.select("qid", "doc_id", "score"), "_vn")
    hits = (
        F.when(F.col("_tn").isNotNull(), 1).otherwise(0)
        + F.when(F.col("_vn").isNotNull(), 1).otherwise(0)
    )
    fused = t.join(v, ["qid", "doc_id"], "full_outer").select(
        "qid", "doc_id",
        F.round(
            (F.coalesce("_tn", F.lit(0.0)) + F.coalesce("_vn", F.lit(0.0)))
            * (hits if mnz else F.lit(1)),
            6,
        ).alias("fused"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("fused"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def build_ivf_index(
    embs: DataFrame,
    path: str,
    *,
    every_m: int = 50,
    train_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist an IVF layout: vectors written ``partitionBy(cell)`` +
    the centroid table. This makes the scale claim in :func:`ivf_topk`'s
    docstring PHYSICAL: probing n_probe cells is directory-level
    partition pruning on the vector table — excluded cells are never
    listed, opened, or decoded. Same centroid construction as ivf_topk
    (deterministic; ``train_iters > 0`` = Lloyd refinement), so the
    persisted index answers queries identically to the in-memory plan.
    """
    if train_iters:
        centroids = kmeans_centroids(
            embs, every_m=every_m, iters=train_iters,
            vec_col=vec_col, id_col=id_col,
        )
    else:
        centroids = embs.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        ).where(F.col("centroid_id") % every_m == 0)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    cells = assign_cells(embs, centroids, vec_col=vec_col, id_col=id_col)
    (
        embs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .join(cells, "_id")
        .select(
            F.col("_id").alias(id_col), F.col("_v").alias(vec_col), "cell"
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )


def ivf_add_delta(
    spark,
    path: str,
    new_vecs: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    check_disjoint: bool = True,
) -> int:
    """Incremental vector ingestion into the persisted IVF layout — the
    embedding-side twin of indexing.merge.merge_serving_delta: new
    vectors are assigned to cells by the EXISTING centroid table (the
    IVF contract — centroids train offline and stay fixed between
    rebuilds, exactly Faiss's add-after-train) and appended into their
    cell directories.

    Cost is O(|delta|): one broadcast-centroid assignment pass plus a
    partitionBy append — base vector files are never read or rewritten
    (``check_disjoint`` reads only the base id COLUMN, a pruned scan).
    Queries need no code change: partition pruning lists old and new
    files of a probed cell alike, so post-delta results are identical
    to a rebuild over the union with the same centroids (pytest-pinned
    in tests/test_partitioned.py). Returns the number of vectors added.
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    ids = new_vecs.select(F.col(id_col).alias("_id"))
    if check_disjoint:
        dup = (
            spark.read.parquet(f"{path}/vectors")
            .select(F.col(id_col).alias("_id"))
            .join(ids, "_id", "left_semi")
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"ivf_add_delta: {id_col}={dup[0]['_id']} already exists "
                "in the index (delta ids must be fresh)"
            )
    cells = assign_cells(new_vecs, centroids, vec_col=vec_col,
                         id_col=id_col)
    out = (
        new_vecs.select(F.col(id_col).alias("_id"),
                        F.col(vec_col).alias("_v"))
        .join(cells, "_id")
        .select(F.col("_id").alias(id_col), F.col("_v").alias(vec_col),
                "cell")
    )
    n = out.count()
    out.write.mode("append").partitionBy("cell").parquet(f"{path}/vectors")
    return n


def ivf_topk_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    *,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """IVF top-k over the persisted layout: the probed cell set (tiny —
    |Q| × n_probe values, collected driver-side like the batch term list)
    lands on the vector scan as a partition-column IN-filter, so Spark
    reads ONLY those cell directories (``PartitionFilters`` in the plan,
    pinned by pytest). Scoring is the same exact-cosine + max-over-probes
    aggregation as :func:`ivf_topk`, so results are identical to the
    in-memory plan with the same parameters."""
    centroids = spark.read.parquet(f"{path}/centroids")
    qcells = assign_cells(
        queries.withColumnRenamed(qvec_col, vec_col)
        .withColumnRenamed(qid_col, id_col),
        centroids, vec_col=vec_col, id_col=id_col, n_probe=n_probe,
    )
    probed = [r["cell"] for r in qcells.select("cell").distinct().collect()]
    vecs = spark.read.parquet(f"{path}/vectors").where(
        F.col("cell").isin(probed)
    )
    e = with_norm(vecs, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"),
        F.col("_norm").alias("_vn"), "cell",
    )
    q = with_norm(
        queries.withColumnRenamed(qvec_col, "embedding"), "embedding"
    ).select(
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


def semdedup(
    embs: DataFrame,
    centroids: DataFrame,
    *,
    tau: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cell, is_dup) — SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): semantic near-duplicate marking INSIDE k-means
    clusters. A vector is a duplicate when some LOWER-id vector in the
    SAME cluster has round-6 cosine ≥ tau with it (deterministic
    keep-lowest-id stand-in for the paper's keep-farthest-from-centroid,
    which ties on unordered floats).

    This is the scale path between exact dedup and corpus-wide
    emb_lsh_pairs: clustering first means pair enumeration is bounded by
    the cluster size, not the corpus — k balanced cells cut the all-pairs
    cost by ~k, and each cell's pair block is an independent task. The
    hazard is cluster-size skew (one mega-cell re-creates all-pairs);
    production sizing picks k ∝ √N or recursively splits cells over a
    member-count threshold — at the fixture scale cells are ~every_m
    members by construction.

    Plan: one broadcast nearest-centroid assignment (assign_cells), one
    cell-keyed self-join restricted a.id < b.id with JVM-side zip_with
    cosine, one distinct + left join to flag. No UDFs, no collect.
    """
    cells = assign_cells(embs, centroids, vec_col=vec_col, id_col=id_col)
    v = with_norm(
        embs.select(
            F.col(id_col).alias("_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("_v"),
        ),
        "_v",
    ).join(cells, "_id")
    a = v.select(
        F.col("_id").alias("_ida"), "cell",
        F.col("_v").alias("_va"), F.col("_norm").alias("_na"),
    )
    b = v.select(
        F.col("_id").alias("_idb"), "cell",
        F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"),
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("_ida") < F.col("_idb"))
        .where(
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            )
            >= tau
        )
        .select(F.col("_idb").alias("_id"))
        .distinct()
        .withColumn("_flag", F.lit(1))
    )
    return cells.join(dups, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.col("cell").cast("long").alias("cell"),
        F.coalesce(F.col("_flag"), F.lit(0)).cast("long").alias("is_dup"),
    )
