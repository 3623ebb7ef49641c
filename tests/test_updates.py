"""Document updates: update_serving_docs = Lucene updateDocument
(tombstone the superseded internal ids + merge the new versions under
fresh ids), and the snapshot_diff-driven incremental recrawl composition.

Semantics oracle, as for merges and deletes: the reference rebuilds from
scratch, so a rebuild over the intended post-update corpus IS the oracle
— after compaction the updated index must be indistinguishable from it.
Pre-compaction pins Lucene's stale-stats liveDocs grain.
"""

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing.build import (
    build_and_save_serving,
    load_serving_index,
)
from themis_search_engine_spark.indexing.merge import (
    compact_serving_index,
    load_tombstones,
    update_serving_docs,
)
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
from themis_search_engine_spark.queryeng.wand import wand_topk

CB = 4


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


@pytest.fixture(scope="module")
def corpus(spark):
    """20 base docs; ids 100/101 are arriving replacements for 3 and 7."""
    rows = [
        (i, f"alpha beta doc{i} " + " ".join(f"w{i}x{j}" for j in range(6)))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def new_versions(spark):
    return spark.createDataFrame(
        [
            (100, "alpha gamma rewritten page three entirely new body"),
            (101, "beta gamma rewritten page seven fresh content words"),
        ],
        "doc_id long, text string",
    ).cache()


def test_update_pre_compaction_livedocs(spark, corpus, new_versions, tmp_path):
    """After update: superseded ids never surface, new versions do, and
    the stats are the stale union (old + new versions both counted)."""
    p = str(tmp_path / "idx")
    build_and_save_serving(corpus, p, stem=False, chunk_bits=CB, partitions=8)
    idx = update_serving_docs(spark, p, new_versions, [3, 7],
                              stem=False, partitions=8)

    assert idx.n_docs == 22  # stale: 20 base + 2 new, tombstones counted
    tomb = load_tombstones(spark, p)
    assert sorted(r["doc_id"] for r in tomb.collect()) == [3, 7]

    qt = qterms_df(spark, {1: "alpha gamma", 2: "beta"}, stem=False)
    live = idx.postings_flat.join(F.broadcast(tomb), "doc_id", "left_anti")
    got = {
        r["doc_id"]
        for r in bm25_score_all(qt, live, idx.dictionary, idx.doc_stats,
                                idx.avgdl).collect()
    }
    assert {3, 7}.isdisjoint(got)
    assert {100, 101} <= got


def test_update_then_compact_equals_rebuild(spark, corpus, new_versions,
                                            tmp_path):
    """The rebuild pin: update + compact ≡ fresh build over the post-
    update corpus (base minus replaced, plus new versions)."""
    p = str(tmp_path / "idx")
    build_and_save_serving(corpus, p, stem=False, chunk_bits=CB, partitions=8)
    update_serving_docs(spark, p, new_versions, [3, 7],
                        stem=False, partitions=8)
    idx = compact_serving_index(spark, p, partitions=8)
    assert load_tombstones(spark, p) is None

    want_corpus = corpus.where("doc_id NOT IN (3, 7)").union(new_versions)
    p2 = str(tmp_path / "fresh")
    fresh = build_and_save_serving(want_corpus, p2, stem=False,
                                   chunk_bits=CB, partitions=8)

    assert idx.n_docs == fresh.n_docs == 20
    assert idx.avgdl == fresh.avgdl
    assert _dict_rows(idx) == _dict_rows(fresh)

    qt = qterms_df(spark, {1: "alpha gamma", 2: "beta doc1"}, stem=False)
    got = wand_topk(qt, idx.compressed, idx.dictionary, idx.avgdl, k=10,
                    chunk_bits=CB)
    want = wand_topk(qt, fresh.compressed, fresh.dictionary, fresh.avgdl,
                     k=10, chunk_bits=CB)
    assert _ranked(got) == _ranked(want)


def test_snapshot_diff_drives_update(spark, tmp_path):
    """The recrawl composition with all three statuses live at once:
    an unchanged URL keeps serving its OLD doc_id (never re-tokenized),
    a changed URL serves the new snapshot only, a new URL appears."""
    from themis_search_engine_spark.pipeline_ops.websnap import snapshot_diff

    # crawl 1: urls a, b, c → doc_ids 1, 2, 3
    # crawl 2: a unchanged (id 11, same text), b changed (id 12), d new (14)
    pages = spark.createDataFrame(
        [
            ("https://h/a", 1, 1, "alpha stable body"),
            ("https://h/b", 1, 2, "beta original body"),
            ("https://h/c", 1, 3, "gamma only crawled once"),
            ("https://h/a", 2, 11, "alpha stable body"),
            ("https://h/b", 2, 12, "beta completely rewritten body"),
            ("https://h/d", 2, 14, "delta newly discovered page"),
        ],
        "url string, warc_ts long, doc_id long, text string",
    )
    diff = snapshot_diff(pages)
    by_url = {r["url"]: r for r in diff.collect()}
    assert by_url["https://h/a"]["status"] == "unchanged"
    assert by_url["https://h/b"]["status"] == "changed"
    assert by_url["https://h/d"]["status"] == "new"

    # base index = the prev set (single-snapshot urls like c arrive as
    # 'new' through the merge — snapshot_diff has no notion of which
    # crawl a lone snapshot belongs to; the registry bundle uses the
    # same convention)
    base_ids = {1, 2}
    docs = pages.select("doc_id", "text")
    p = str(tmp_path / "idx")
    build_and_save_serving(
        docs.where(F.col("doc_id").isin(list(base_ids))), p,
        stem=False, chunk_bits=CB, partitions=4,
    )
    merged_ids = [
        r["cur_doc_id"]
        for r in diff.where("status IN ('new', 'changed')").collect()
    ]
    dead_ids = [
        r["prev_doc_id"] for r in diff.where("status = 'changed'").collect()
    ]
    assert sorted(merged_ids) == [3, 12, 14] and dead_ids == [2]
    update_serving_docs(
        spark, p, docs.where(F.col("doc_id").isin(merged_ids)), dead_ids,
        stem=False, partitions=4,
    )
    idx = compact_serving_index(spark, p, partitions=4)

    # live corpus: a's OLD id 1 (unchanged → id 11 never indexed),
    # b's new id 12, c's 3, d's 14
    live = {r["doc_id"] for r in idx.doc_stats.collect()}
    assert live == {1, 3, 12, 14}

    qt = qterms_df(spark, {1: "alpha beta delta"}, stem=False)
    got = {
        r["doc_id"]
        for r in wand_topk(qt, idx.compressed, idx.dictionary, idx.avgdl,
                           k=10, chunk_bits=CB).collect()
    }
    assert 2 not in got and 11 not in got
    assert {1, 12, 14} <= got
