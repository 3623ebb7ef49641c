"""Topical shard assignment for selective search.

Random (doc_id % n) document sharding forces top-m-of-n selective
routing to a recall floor of ~m/n: a query's relevant docs scatter
uniformly, so skipping a shard skips that fraction of them regardless of
the selection formula (Kulkarni & Callan, SIGIR'10 — the measured 0.514
floor in FEDERATED_SCALE.json at m=2, n=4). TOPICAL assignment co-locates
a query's relevant docs in few shards, so the CORI-selected top-m shards
capture most of the union top-k: the same paper reports 0.8+ recall with
cluster-based assignment.

This module is the assignment operator: hashed-TF document vectors →
deterministic k-means (simsearch.kmeans_centroids — no RNG, grain-
quantized, engine-reproducible) → nearest-centroid classification of
every doc → a dense (doc_id, shard) map a builder joins against the
corpus to build per-shard serving indexes (see scripts/federated_scale.py
for the full random-vs-topical experiment).

Scale shape (10^12 docs):
  - vectors: one tokenize pass + one (doc_id, pos) shuffle — same order
    as the index build's own counting pass; dim is a small constant so a
    doc vector is ~dim*8 bytes.
  - training: on a deterministic doc_id % train_mod sample (the paper
    trains on samples too); the full corpus never enters Lloyd.
  - assignment: nearest-centroid over the collected (tiny) centroid
    table as ONE numpy matmul per Arrow batch
    (simsearch.centroid_classify_arrow) — no shuffle at all.
  - the map is a join key, not a collect: nothing doc-scale reaches the
    driver.

Reference parity: the reference has no selective search (single-node,
one index); this is a scale-path addition measured against its exact
single-index ranking via the recall@k artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..pipeline_ops.sampling import _hash_bucket

DEFAULT_DIM = 256


def doc_tf_vectors(
    docs: DataFrame,
    *,
    dim: int = DEFAULT_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    stem: bool = False,
    salt: str = "tfvec",
    weighting: str = "tfidf",
    counts: DataFrame | None = None,
    df_table: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, embedding: array<double>) — hashed bag-of-words doc
    vectors: every post-stopword token hashes (seeded-md5, the engine's
    portable hash) to one of ``dim`` buckets; the vector is the
    per-bucket sum of term weights. Cosine geometry downstream makes L2
    normalization unnecessary (scale-invariant).

    ``weighting``:
      'tfidf' (default) — w = log1p(cnt) · log2(N/df), sublinear TF with
        the engine's VSM idf (A7's log2(N/df), build.py vsm_doc_norms).
        On a Zipf corpus this is what makes clustering WORK: raw counts
        are dominated by ubiquitous head terms, making every doc's
        vector near-parallel (measured: k-means over raw-TF vectors of
        the synthetic corpus collapses to ONE cluster; tf-idf recovers
        the planted topics) — the standard selective-search practice
        (Kulkarni & Callan cluster tf-idf vectors).
      'tf' — w = cnt: no corpus statistics, single pass, for corpora
        without a Zipf head or for oracle simplicity.

    Zero-token docs (all-stopword / non-ASCII) get NO row — they carry no
    topical signal; callers that must place them anyway get a
    deterministic fallback from :func:`topical_shard_map`.

    Plan: the textproc tokenize kernel (one Arrow pass, the same kernel
    the index build uses) → [tfidf: a term-keyed df agg + broadcast-style
    join back] → groupBy(doc_id, bucket) partial-agg sum → one numpy
    scatter per Arrow batch to densify (the Catalyst sequence+element_at
    alternative costs dim interpreted lookups per row — measured as the
    dominant assignment cost at dim=256).

    RIDE THE BUILD'S OWN PASS (r5): an index build already tokenizes the
    corpus into (doc_id, term, cnt) — the serving layout persists it as
    ``postings_raw`` — and already aggregates per-term df into the
    dictionary and N into global_stats. Pass those as ``counts`` /
    ``df_table`` (term, df) / ``n_docs`` and the vectors cost ONE
    bucket-sum aggregation over the existing table instead of a second
    full tokenize + df pass (r4 measured assignment at 3× the cost of
    the shard builds it feeds, all of it this redundancy). Given inputs
    from the same tokenizer settings the output is row-identical to the
    self-computed path (pinned in tests/test_topical.py). ``stem`` is
    ignored when ``counts`` is given — the counts carry their
    tokenization.
    """
    from ..textproc import term_counts_arrow

    if counts is None:
        counts = term_counts_arrow(docs, text_col, id_col, stem=stem)
    counts = counts.select("doc_id", "term", "cnt")
    if weighting == "tfidf":
        if n_docs is None:
            n_docs = docs.count()
        if df_table is None:
            df = counts.groupBy("term").agg(
                F.count(F.lit(1)).alias("_df")
            )
        else:
            df = df_table.select("term", F.col("df").alias("_df"))
        w = (
            F.log1p(F.col("cnt"))
            * F.log2(F.lit(float(n_docs)) / F.col("_df"))
        )
        counts = counts.join(df, "term").select(
            "doc_id", "term", w.alias("w")
        )
    elif weighting == "tf":
        counts = counts.select(
            "doc_id", "term", F.col("cnt").cast("double").alias("w")
        )
    else:
        raise ValueError(f"unknown weighting {weighting!r}")
    sparse = (
        counts.groupBy(
            "doc_id", (_hash_bucket(F.col("term"), salt) % dim).alias("pos")
        )
        .agg(F.sum("w").cast("double").alias("w"))
    )
    # densify in an Arrow kernel: one numpy scatter per batch. The
    # Catalyst alternative (sequence(0, dim-1) + element_at over a map)
    # evaluates dim interpreted HOF lookups PER ROW — measured as the
    # dominant cost of the whole assignment at dim=256 (the lineage runs
    # once for training and once for classification).
    import numpy as np
    import pandas as pd

    id_t = docs.schema[id_col].dataType.simpleString()

    def densify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["ps"].map(len).to_numpy()
            rows = np.repeat(np.arange(len(pdf)), lens)
            pos = np.concatenate(pdf["ps"].to_numpy()).astype(np.int64)
            w = np.concatenate(pdf["ws"].to_numpy()).astype(np.float64)
            M = np.zeros((len(pdf), dim), dtype=np.float64)
            M[rows, pos] = w
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "embedding": list(M),
            })

    pw = (
        sparse.groupBy("doc_id")
        .agg(F.collect_list(F.struct("pos", "w")).alias("pw"))
        .select(
            "doc_id",
            F.col("pw.pos").alias("ps"),
            F.col("pw.w").alias("ws"),
        )
    )
    return pw.mapInPandas(
        densify, f"doc_id {id_t}, embedding array<double>"
    )


def topical_shard_map(
    docs: DataFrame,
    n_shards: int,
    *,
    dim: int = DEFAULT_DIM,
    iters: int = 2,
    grain: int | None = 6,
    train_mod: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    stem: bool = False,
    weighting: str = "tfidf",
    n_clusters: int | None = None,
    counts: DataFrame | None = None,
    df_table: DataFrame | None = None,
    n_docs: int | None = None,
    cache_vectors: bool = False,
) -> DataFrame:
    """(doc_id, shard) — every input doc assigned to one of ``n_shards``
    topical shards (shard ∈ [0, n_shards), dense ids).

    Cluster-then-pack: Lloyd trains ``n_clusters`` (default 4·n_shards)
    topical clusters, every doc is classified to its nearest cluster,
    then WHOLE clusters are greedily packed into shards balanced by doc
    count (largest-first into the least-loaded shard — deterministic,
    driver-side over just n_clusters size rows). Direct k=n_shards
    clustering leaves shards topical but badly SIZED (measured 4x skew:
    vanilla k-means freely merges topics into one cell); over-clustering
    + bin-packing keeps topic coherence per shard AND near-equal shard
    sizes (measured ≤4% spread), which is what makes per-shard serving
    latency uniform. The same two-level recipe as Kulkarni & Callan's
    sample-cluster-then-allocate.

    ``train_mod``: Lloyd trains on the ``doc_id % train_mod == 0``
    deterministic sample — the corpus-scale lever (at 10^12 docs train on
    ~10^6 docs; assignment still covers everything). Seeds are exactly
    ``min(n_clusters, n_train)`` vectors evenly strided through the
    id-ordered training sample, passed to kmeans_centroids as an
    explicit ``init`` — robust to sparse/sampled id spaces.

    Docs with no tokens carry no topical signal and fall back to
    ``doc_id % n_shards`` — deterministic, and consistent with how the
    random baseline places every doc.

    ``counts`` / ``df_table`` / ``n_docs`` forward to
    :func:`doc_tf_vectors` — pass an existing index build's
    ``postings_raw`` + dictionary + N so the assignment rides the
    build's own counting pass instead of re-tokenizing the corpus.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    vecs = doc_tf_vectors(
        docs, dim=dim, text_col=text_col, id_col=id_col, stem=stem,
        weighting=weighting, counts=counts, df_table=df_table,
        n_docs=n_docs,
    ).withColumnRenamed("doc_id", "vec_id")
    assigned = vector_shard_map(
        vecs, n_shards, iters=iters, grain=grain, train_mod=train_mod,
        n_clusters=n_clusters, cache_vectors=cache_vectors,
    )
    # left-join back so token-free docs still get a deterministic shard
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(assigned.withColumnRenamed("vec_id", "doc_id"), "doc_id",
              "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("shard"), F.pmod(F.col("doc_id"), F.lit(n_shards))
            ).cast("int").alias("shard"),
        )
    )


def vector_shard_map(
    vecs: DataFrame,
    n_shards: int,
    *,
    iters: int = 2,
    grain: int | None = 6,
    train_mod: int = 1,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cache_vectors: bool = False,
) -> DataFrame:
    """(vec_id, shard) — the cluster-then-pack core of
    :func:`topical_shard_map` over any vector table (hashed-TF doc
    vectors, or real embeddings — e.g. shard an ANN corpus topically).
    Deterministic end to end: strided seeds, grain-quantized Lloyd,
    rounded-cosine classification, size-ordered greedy packing.

    ``cache_vectors``: cache the FULL vector table, not just the
    training sample. The vector lineage otherwise runs twice (once
    filtered for training, once for classification) — at corpus sizes
    whose vectors fit cluster memory (~dim·8 B/doc) this halves the
    assignment's dominant cost. Deliberately opt-in: at 10^12 docs the
    vector table is ~2 TB and the two-streaming-pass default is the
    scale-safe shape.
    """
    from ..pipeline_ops.simsearch import (
        centroid_classify_arrow,
        kmeans_centroids,
    )

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    vecs = vecs.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if cache_vectors:
        vecs = vecs.cache()
    if n_shards == 1:
        return vecs.select("vec_id", F.lit(0).alias("shard"))

    # cache the TRAINING vectors: every Lloyd iteration re-reads them,
    # and without a cache each iteration would re-run the full vectorize
    # lineage (tokenize + df + bucket aggs over the whole corpus —
    # measured 6x the assignment cost at 400k docs). Bounded by
    # train_mod, the explicit scale lever.
    train = (
        vecs.where(F.col("vec_id") % train_mod == 0)
        if train_mod > 1 else vecs
    ).cache()
    n_train = train.count()
    if n_train == 0:
        return vecs.select(
            "vec_id",
            F.pmod(F.col("vec_id"), F.lit(n_shards)).cast("int").alias(
                "shard"
            ),
        )
    # EXACTLY min(n_clusters, n_train) seeds, evenly spread through the
    # id-ordered training sample. A global row_number window is fine
    # HERE — the training sample is bounded by train_mod (the scale
    # lever), never corpus-sized. The naive alternative (the modulo
    # seed rule on raw ids) intersects with the train_mod sampling and
    # can silently keep <k seeds → collapsed clustering (observed).
    k_clusters = n_clusters if n_clusters is not None else 4 * n_shards
    k_clusters = max(n_shards, min(k_clusters, n_train))
    ranked = train.withColumn(
        "_rk", F.row_number().over(Window.orderBy("vec_id")) - 1
    )
    stride = max(1, n_train // k_clusters)
    seeds = (
        ranked.where(
            (F.col("_rk") % stride == 0)
            & (F.col("_rk") < stride * k_clusters)
        )
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    cents = kmeans_centroids(
        ranked.select("vec_id", "embedding"),
        iters=iters, grain=grain, init=seeds,
    )
    lab = cents.select(
        F.col("centroid_id").alias("label"), F.col("centroid_vec")
    )
    # cached because the cluster table feeds TWO consumers (the size
    # collect and the final join) — MEMORY_AND_DISK, two narrow columns;
    # at extreme scale persist to a table instead and read it twice
    clustered = centroid_classify_arrow(vecs, lab).select(
        "vec_id", "pred_label"
    ).cache()
    # greedy size-balanced packing of WHOLE clusters into shards:
    # largest cluster first into the least-loaded shard, ties broken on
    # (cluster id, shard id) — driver-side over k_clusters count rows
    csizes = {
        r["pred_label"]: int(r["count"])
        for r in clustered.groupBy("pred_label").count().collect()
    }
    load = [0] * n_shards
    pack: dict = {}
    for c in sorted(csizes, key=lambda c: (-csizes[c], c)):
        s = min(range(n_shards), key=lambda x: (load[x], x))
        pack[c] = s
        load[s] += csizes[c]
    pack_df = F.broadcast(
        vecs.sparkSession.createDataFrame(
            [(int(c), int(s)) for c, s in pack.items()],
            "pred_label long, shard int",
        )
    )
    return clustered.join(pack_df, "pred_label").select("vec_id", "shard")


def build_topical_serving(
    docs: DataFrame,
    path: str,
    n_shards: int,
    *,
    stem: bool = True,
    partitions: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    **assign_kw,
):
    """Build a complete selective-search serving tier under ``path``:
    the topical shard map, one serving index per shard (``leg0..n-1``),
    and a meta file — the two-call selective story (this +
    :func:`load_topical_serving` → queryeng.selective_wand_topk).

    Physical shape: the assignment is materialized ONCE, partitioned by
    shard, so each leg build is a partition-pruned scan — the
    cluster+classify lineage never re-runs per leg. ``assign_kw``
    forwards to :func:`topical_shard_map` (dim, iters, train_mod,
    n_clusters, weighting — and counts/df_table/n_docs, so a caller
    holding an existing central index passes its postings_raw +
    dictionary + N and the assignment skips the tokenize pass).

    Returns the list of built ServingIndex handles.
    """
    import json
    import os

    from ..indexing.build import build_and_save_serving

    spark = docs.sparkSession
    docs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    smap = topical_shard_map(docs, n_shards, **assign_kw)
    docs.join(smap, "doc_id").write.partitionBy("shard").mode(
        "overwrite"
    ).parquet(f"{path}/sh_corpus")
    sh = spark.read.parquet(f"{path}/sh_corpus")
    legs = []
    for i in range(n_shards):
        legs.append(build_and_save_serving(
            sh.where(F.col("shard") == i).select("doc_id", "text"),
            f"{path}/leg{i}", stem=stem, partitions=partitions,
        ))
    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/_topical_meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump({"n_shards": n_shards, "stem": stem}, fh)
    os.replace(tmp, f"{path}/_topical_meta.json")
    return legs


def load_topical_serving(spark, path: str):
    """(legs, meta) — reload a :func:`build_topical_serving` tier for
    queryeng.selective_wand_topk / federated_wand_topk."""
    import json

    from ..indexing.build import load_serving_index

    with open(f"{path}/_topical_meta.json") as fh:
        meta = json.load(fh)
    legs = tuple(
        load_serving_index(spark, f"{path}/leg{i}")
        for i in range(int(meta["n_shards"]))
    )
    return legs, meta
