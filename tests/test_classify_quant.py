"""Nearest-centroid classification + int8-quantized ANN
(pipeline_ops/simsearch.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from themis_search_engine_spark.pipeline_ops.simsearch import (
    centroid_classify,
    cosine_topk,
    label_centroids,
    quantize_embeddings,
    quantized_topk,
)


def _clustered(spark):
    # two well-separated clusters in 4-d: label 0 ~ e1, label 1 ~ e3
    rows = []
    for i in range(20):
        bump = (i % 5) * 0.01
        if i % 2 == 0:
            rows.append((i, [1.0, bump, 0.0, 0.0], 0))
        else:
            rows.append((i, [0.0, 0.0, 1.0, bump], 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_centroid_classify_separable(spark):
    embs = _clustered(spark)
    cents = label_centroids(embs, labeled=F.col("vec_id") % 5 == 0)
    assert cents.count() == 2
    out = centroid_classify(embs, cents).collect()
    assert len(out) == 20  # exactly one prediction per vector
    for r in out:
        assert r["pred_label"] == r["vec_id"] % 2
        assert r["cosine"] > 0.9


def test_quantize_roundtrip_error_bounded(spark):
    embs = _clustered(spark)
    q = quantize_embeddings(embs).collect()
    orig = {r["vec_id"]: r["embedding"] for r in embs.collect()}
    for r in q:
        v = orig[r["vec_id"]]
        assert len(r["qvec"]) == len(v)
        assert all(abs(x) <= 127 for x in r["qvec"])
        for x, qx in zip(v, r["qvec"]):
            assert abs(x - qx * r["scale"]) <= r["scale"] / 2 + 1e-12


def test_quantized_topk_rescored_matches_exact(spark):
    """With exact rescoring, the quantized path returns vectors whose
    scores are the TRUE cosines; on separable data, candidates at
    refine=3 contain the true top-k, so the result equals brute force."""
    embs = _clustered(spark)
    queries = embs.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    quant = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in quantized_topk(
            quantize_embeddings(embs), embs, queries, k=5, refine=3
        ).collect()
    }
    assert set(quant) == set(exact)
    for key, (vid, cos) in quant.items():
        assert vid == exact[key][0]
        assert math.isclose(cos, exact[key][1], rel_tol=1e-9)


def test_centroid_classify_arrow_decision_identical(spark):
    """The Arrow matmul twin must make the SAME (vec_id, pred_label)
    decisions as the Catalyst crossJoin form — 6-dp rounded argmax,
    label-asc ties — and agree on cosine to float dust."""
    from themis_search_engine_spark.corpus import load_embeddings
    from themis_search_engine_spark.pipeline_ops.simsearch import (
        centroid_classify_arrow,
    )

    embs = load_embeddings(spark, "/root/testdata/sf0.001").select(
        "vec_id", "embedding", "label"
    )
    cents = label_centroids(embs, labeled=F.col("vec_id") % 5 == 0)
    want = {
        r["vec_id"]: (r["pred_label"], r["cosine"])
        for r in centroid_classify(embs, cents).collect()
    }
    got = {
        r["vec_id"]: (r["pred_label"], r["cosine"])
        for r in centroid_classify_arrow(embs, cents).collect()
    }
    assert set(got) == set(want) and len(want) > 50
    for vid, (lab, cos) in want.items():
        glab, gcos = got[vid]
        assert glab == lab, vid
        assert math.isclose(gcos, cos, rel_tol=1e-9), vid
