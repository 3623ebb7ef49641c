"""Index fsck: all-zero on a healthy index, fires on each corruption."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.indexing.build import InvertedIndex
from themis_search_engine_spark.indexing.fsck import verify_index


@pytest.fixture(scope="module")
def idx(spark, tiny_docs_df):
    return build_index(tiny_docs_df, stem=False, use_arrow=False).cache()


def _counts(idx):
    out = verify_index(idx).collect()
    assert len(out) == 7
    return {r.check: r.violations for r in out}


def _mutate(idx, **repl) -> InvertedIndex:
    return InvertedIndex(
        counts=repl.get("counts", idx.counts),
        postings_flat=repl.get("postings_flat", idx.postings_flat),
        dictionary=repl.get("dictionary", idx.dictionary),
        doc_stats=repl.get("doc_stats", idx.doc_stats),
        global_stats=repl.get("global_stats", idx.global_stats),
        n_docs=idx.n_docs,
        avgdl=idx.avgdl,
    )


def test_healthy_index_is_all_zero(idx):
    assert set(_counts(idx).values()) == {0}


def test_fsck_catches_each_corruption(spark, idx):
    # df off by one for one term
    bad_dict = idx.dictionary.withColumn(
        "df",
        F.when(F.col("term") == "lazy", F.col("df") + 1).otherwise(
            F.col("df")
        ),
    )
    assert _counts(_mutate(idx, dictionary=bad_dict))["df_mismatch"] == 1

    # a posting pointing at a doc with no stats row
    ghost = idx.postings_flat.limit(1).withColumn(
        "doc_id", F.lit(999999).cast(idx.postings_flat.schema["doc_id"].dataType)
    )
    bad_post = idx.postings_flat.unionByName(ghost)
    got = _counts(_mutate(idx, postings_flat=bad_post))
    assert got["orphan_postings"] == 1
    assert got["df_mismatch"] >= 1  # the extra row also breaks that df

    # doc length drifts from the counts rollup
    bad_stats = idx.doc_stats.withColumn(
        "length",
        F.when(F.col("doc_id") == 0, F.col("length") + 5).otherwise(
            F.col("length")
        ),
    )
    got = _counts(_mutate(idx, doc_stats=bad_stats))
    assert got["length_mismatch"] == 1
    assert got["avgdl_mismatch"] == 1  # avg(length) moved too

    # tf outside (0, 1]
    bad_tf = idx.postings_flat.withColumn(
        "tf",
        F.when(
            (F.col("term") == "lazy") & (F.col("doc_id") == 2), F.lit(1.5)
        ).otherwise(F.col("tf")),
    )
    assert _counts(_mutate(idx, postings_flat=bad_tf))[
        "tf_out_of_range"
    ] == 1

    # global stats disagree with doc_stats
    bad_gs = idx.global_stats.select(
        (F.col("n_docs") + 2).alias("n_docs"), "avgdl"
    )
    assert _counts(_mutate(idx, global_stats=bad_gs))[
        "n_docs_mismatch"
    ] == 2
