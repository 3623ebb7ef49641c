"""Document-delete lifecycle: tombstone (delete_serving_docs) →
liveDocs-masked queries → compaction makes deletes physical and restores
fresh-build statistics.

Semantics oracle: the reference has no delete path at all (Indexer.java
rebuilds from scratch), so — exactly as for delta merge (test_merge.py) —
the rebuild IS the oracle: an index that was tombstoned then compacted
must be indistinguishable (stats, dictionary, postings, ranks) from a
fresh build over the surviving corpus. Pre-compaction semantics are
Lucene's liveDocs contract: deleted docs are masked out of candidates
while df/N/avgdl stay stale until the next compaction.
"""

import json
import os

from themis_search_engine_spark.corpus import load_documents
from themis_search_engine_spark.indexing.build import (
    build_and_save_serving,
    load_serving_index,
)
from themis_search_engine_spark.indexing.merge import (
    compact_serving_index,
    delete_serving_docs,
    describe_index,
    load_tombstones,
    merge_serving_delta,
    serving_bound_scales,
)
from themis_search_engine_spark.oracle_sql import QUERYSET
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
from themis_search_engine_spark.queryeng.wand import wand_topk

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
CB = 4

KEEP = "doc_id % 7 <> 0"
DROP = "doc_id % 7 = 0"


def _ranked(df):
    return sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    )


def _dict_rows(idx):
    return sorted(
        (r["term"], r["df"], round(r["idf"], 12))
        for r in idx.dictionary.collect()
    )


def _stats_rows(idx):
    return sorted(
        (r["doc_id"], r["length"], r["maxcnt"]) for r in idx.doc_stats.collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_DIR).select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def survivor_idx(spark, docs, tmp_path_factory):
    """Fresh build over the surviving corpus alone — the oracle."""
    p = str(tmp_path_factory.mktemp("survivors") / "idx")
    return build_and_save_serving(docs.where(KEEP), p, stem=False,
                                  chunk_bits=CB, partitions=8)


@pytest.fixture(scope="module")
def deleted_idx_path(spark, docs, tmp_path_factory):
    """Full-corpus index with every doc_id % 7 == 0 doc tombstoned."""
    p = str(tmp_path_factory.mktemp("deleted") / "idx")
    build_and_save_serving(docs, p, stem=False, chunk_bits=CB, partitions=8)
    n = delete_serving_docs(
        spark, p, docs.where(DROP).select("doc_id"))
    assert n > 0
    return p


def test_tombstones_do_not_touch_index_tables(spark, docs, deleted_idx_path):
    """delete_serving_docs is O(|deletes|): stats/postings/dictionary are
    untouched; only the tombstone set and the log grow."""
    idx = load_serving_index(spark, deleted_idx_path)
    n_all = docs.count()
    assert idx.n_docs == n_all  # stale N, by design
    assert idx.doc_stats.count() == n_all
    tomb = load_tombstones(spark, deleted_idx_path)
    assert tomb is not None
    assert tomb.count() == docs.where(DROP).count()
    log = json.load(open(os.path.join(deleted_idx_path, "merge_log.json")))
    assert log[-1]["type"] == "delete"
    assert log[-1]["docs_tombstoned"] == tomb.count()


def test_livedocs_mask_never_surfaces_deleted(spark, deleted_idx_path):
    """Pre-compaction liveDocs semantics: masked BEFORE top-k, so every
    query still fills k with live docs; no tombstoned doc appears even at
    large k."""
    idx = load_serving_index(spark, deleted_idx_path)
    tomb = load_tombstones(spark, deleted_idx_path)
    qt = qterms_df(spark, QUERYSET, stem=False)
    live = idx.postings_flat.join(F.broadcast(tomb), "doc_id", "left_anti")
    scored = bm25_score_all(qt, live, idx.dictionary, idx.doc_stats,
                            idx.avgdl)
    rows = scored.collect()
    assert rows and all(r["doc_id"] % 7 != 0 for r in rows)


def test_delete_then_compact_equals_fresh_build(
    spark, docs, deleted_idx_path, survivor_idx
):
    """The headline contract: compaction applies tombstones physically and
    recomputes every statistic, so the result is indistinguishable from a
    fresh build over the survivors — stats, dictionary, doc_stats, ranks,
    envelope, and fragment count all match."""
    idx = compact_serving_index(spark, deleted_idx_path, partitions=8)

    assert idx.n_docs == survivor_idx.n_docs
    assert idx.avgdl == survivor_idx.avgdl  # exact long arithmetic
    assert _dict_rows(idx) == _dict_rows(survivor_idx)
    assert _stats_rows(idx) == _stats_rows(survivor_idx)
    assert serving_bound_scales(spark, deleted_idx_path) == (1.0, 1.0)
    max_frags = (
        idx.compressed.groupBy("term", "chunk").count()
        .agg({"count": "max"}).collect()[0][0]
    )
    assert max_frags == 1

    qt = qterms_df(spark, QUERYSET, stem=False)
    got = wand_topk(qt, idx.compressed, idx.dictionary, idx.avgdl, k=10,
                    chunk_bits=CB)
    want = wand_topk(qt, survivor_idx.compressed, survivor_idx.dictionary,
                     survivor_idx.avgdl, k=10, chunk_bits=CB)
    assert _ranked(got) == _ranked(want)

    # tombstones are spent; the log records the physical delete count
    assert load_tombstones(spark, deleted_idx_path) is None
    log = json.load(open(os.path.join(deleted_idx_path, "merge_log.json")))
    assert log[-1]["type"] == "compact"
    assert log[-1]["docs_deleted"] > 0
    assert log[-1]["n_docs_after"] == survivor_idx.n_docs

    # reload from disk: persisted layout carries the post-delete stats
    re = load_serving_index(spark, deleted_idx_path)
    assert re.n_docs == survivor_idx.n_docs
    assert re.avgdl == survivor_idx.avgdl


def test_delete_is_idempotent_and_tolerates_unknown_ids(spark, docs, tmp_path):
    """Re-deleting an already-tombstoned or never-indexed doc_id is
    harmless: the distinct read collapses duplicates, and compaction's
    anti-join ignores ids that match nothing."""
    p = str(tmp_path / "idx")
    build_and_save_serving(docs, p, stem=False, chunk_bits=CB, partitions=8)
    delete_serving_docs(spark, p, [0, 7, 14])
    delete_serving_docs(spark, p, [7, 14, 10**9])  # dup + unknown
    tomb = load_tombstones(spark, p)
    assert tomb.count() == 4  # 0, 7, 14, 10**9 — distinct
    idx = compact_serving_index(spark, p, partitions=8)
    n_all = docs.count()
    dropped = docs.where("doc_id in (0, 7, 14)").count()
    assert idx.n_docs == n_all - dropped
    log = json.load(open(os.path.join(p, "merge_log.json")))
    assert log[-1]["docs_deleted"] == dropped  # unknown id counted nowhere


def test_compact_without_matching_tombstones_keeps_stats(spark, docs, tmp_path):
    """Tombstones that match no indexed doc leave compaction on the
    no-delete path: doc_stats untouched, stats unchanged."""
    p = str(tmp_path / "idx")
    build_and_save_serving(docs, p, stem=False, chunk_bits=CB, partitions=8)
    before = load_serving_index(spark, p)
    n0, a0 = before.n_docs, before.avgdl
    delete_serving_docs(spark, p, [10**9, 10**9 + 1])
    idx = compact_serving_index(spark, p, partitions=8)
    assert idx.n_docs == n0 and idx.avgdl == a0
    log = json.load(open(os.path.join(p, "merge_log.json")))
    assert log[-1]["docs_deleted"] == 0
    assert load_tombstones(spark, p) is None  # still spent


def test_delete_after_merge_lifecycle(spark, docs, tmp_path, survivor_idx):
    """add → delete → purge end-to-end: build half, merge the other half,
    tombstone doc_id%7==0, compact — must equal the survivor fresh build.
    Exercises deletes hitting BOTH base and delta segments."""
    p = str(tmp_path / "idx")
    build_and_save_serving(docs.where("doc_id % 2 = 0"), p, stem=False,
                           chunk_bits=CB, partitions=8)
    merge_serving_delta(spark, p, docs.where("doc_id % 2 = 1"),
                        stem=False, partitions=8)
    delete_serving_docs(spark, p, docs.where(DROP).select("doc_id"))
    d = describe_index(spark, p)
    assert d["segments"] == 2  # deletes don't compact
    idx = compact_serving_index(spark, p, partitions=8)
    assert idx.n_docs == survivor_idx.n_docs
    assert idx.avgdl == survivor_idx.avgdl
    assert _dict_rows(idx) == _dict_rows(survivor_idx)
    qt = qterms_df(spark, QUERYSET, stem=False)
    got = wand_topk(qt, idx.compressed, idx.dictionary, idx.avgdl, k=10,
                    chunk_bits=CB)
    want = wand_topk(qt, survivor_idx.compressed, survivor_idx.dictionary,
                     survivor_idx.avgdl, k=10, chunk_bits=CB)
    assert _ranked(got) == _ranked(want)
