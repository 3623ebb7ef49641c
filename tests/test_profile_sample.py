"""dictionary_profile (indexing/profile.py) + cluster_sample
(pipeline_ops/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.indexing.profile import dictionary_profile
from themis_search_engine_spark.pipeline_ops.sampling import cluster_sample


def test_dictionary_profile_partitions_vocabulary(spark, tiny_docs_df):
    idx = build_index(tiny_docs_df, stem=False)
    prof = dictionary_profile(idx.dictionary).collect()
    n_terms = idx.dictionary.count()
    total_df = idx.dictionary.agg(F.sum("df")).collect()[0][0]
    assert sum(r["n_terms"] for r in prof) == n_terms  # exhaustive
    assert sum(r["postings"] for r in prof) == total_df
    by_bucket = {r["df_bucket"]: r for r in prof}
    # bucket 0 = df 1 hapaxes; bucket 1 = df in [2,4)
    assert by_bucket[0]["n_terms"] == by_bucket[0]["postings"]
    for b, r in by_bucket.items():
        assert r["postings"] >= r["n_terms"] * (1 << b)
        assert r["postings"] < r["n_terms"] * (1 << (b + 1))


def test_cluster_sample_singletons_always_kept(spark):
    # 6 singletons + one 4-doc cluster
    rows = [(i, i) for i in range(6)] + [(10 + j, 10) for j in range(4)]
    clusters = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    kept = cluster_sample(clusters).collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert set(range(6)) <= kept_ids  # rate 1/1: always kept
    big = [r for r in kept if r["cluster_id"] == 10]
    assert all(r["cluster_size"] == 4 for r in big)
    assert len(big) <= 4
    # determinism: same input, same survivors
    again = {r["doc_id"] for r in cluster_sample(clusters).collect()}
    assert again == kept_ids
