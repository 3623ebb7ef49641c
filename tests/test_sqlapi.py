"""SQL surface: view registration + spark.sql BM25 rank-identity."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import bm25_topk, qterms_df
from themis_search_engine_spark.queryeng.sqlapi import (
    bm25_sql,
    bm25_topk_sql,
    register_index_views,
)

from tests.conftest import TINY_DOCS

QUERIES = {1: "lazy dog", 2: "spark engine query", 5: "quick"}


@pytest.fixture(scope="module")
def idx(tiny_docs_df):
    return build_index(tiny_docs_df, stem=False).cache()


def test_register_views(spark, idx):
    names = register_index_views(spark, idx)
    assert names == sorted(
        ["themis_postings", "themis_dictionary", "themis_doc_stats",
         "themis_global_stats"]
    )
    got = spark.sql("SELECT count(*) AS c FROM themis_dictionary").collect()
    assert got[0].c == idx.dictionary.count()


def test_sql_rank_identical_to_dataframe_plan(spark, idx):
    qt = qterms_df(spark, QUERIES, stem=False)
    via_sql = bm25_topk_sql(spark, idx, qt, k=10).collect()
    via_df = bm25_topk(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl, k=10
    ).collect()
    key_sql = sorted((r.qid, r.rank, r.doc_id) for r in via_sql)
    key_df = sorted((r.qid, r.rank, r.doc_id) for r in via_df)
    assert key_sql == key_df and len(key_sql) > 0
    s_sql = {(r.qid, r.doc_id): r.score for r in via_sql}
    s_df = {(r.qid, r.doc_id): r.score for r in via_df}
    # the SQL form emits the engine's 6-dp ordering grain; the DataFrame
    # plan returns raw sums — compare at the grain
    for k_, v in s_sql.items():
        assert v == pytest.approx(round(s_df[k_], 6), abs=1e-9)


def test_sql_string_has_in_list_pruning(spark, idx):
    sql = bm25_sql("themis_qterms", k=5, term_in=["spark", "dog"])
    assert "p.term IN ('dog', 'spark')" in sql
    # and the pruned plan actually pushes the filter to the scan
    qt = qterms_df(spark, {1: "spark"}, stem=False)
    plan = bm25_topk_sql(spark, idx, qt, k=5)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "spark" in plan  # the literal reached the optimized plan
