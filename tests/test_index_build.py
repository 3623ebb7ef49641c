"""Index-build correctness on the tiny corpus: hand-checkable df/tf/length
values + agreement with the pure-Python oracle (FIXTURES.md §6 index.golden).
"""

import math

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.oracle import OracleIndex

from tests.conftest import TINY_DOCS


@pytest.fixture(scope="module")
def idx(tiny_docs_df):
    return build_index(tiny_docs_df, stem=True, with_norms=True).cache()


@pytest.fixture(scope="module")
def oidx():
    return OracleIndex.build(TINY_DOCS, stem=True)


def test_global_stats(idx, oidx):
    assert idx.n_docs == 6
    assert idx.avgdl == pytest.approx(oidx.avgdl)


def test_doc_lengths(idx, oidx):
    got = {r["doc_id"]: r["length"] for r in idx.doc_stats.collect()}
    # doc 3 is all-Greek → zero tokens, but still gets a stats row with
    # length 0 (the reference appends a doc record per doc regardless)
    assert got == oidx.doc_len


def test_df_and_tf(idx, oidx):
    dfs = {r["term"]: r["df"] for r in idx.dictionary.collect()}
    assert dfs["lazi"] == 2  # docs 0 and 2
    assert dfs["dog"] == 2
    assert dfs["fox"] == 2  # docs 0 and 5 ('f0x' is a distinct token)
    assert dfs["f0x"] == 1
    assert dfs["42"] == 1  # numbers are indexed (quirk §2.8.8)
    for term, plist in oidx.postings.items():
        assert dfs[term] == len(plist)

    tfs = {
        (r["term"], r["doc_id"]): r["tf"] for r in idx.postings_flat.collect()
    }
    # doc 2: lazy×3 (max), dog×2 → tf(dog)=2/3
    assert tfs[("lazi", 2)] == pytest.approx(1.0)
    assert tfs[("dog", 2)] == pytest.approx(2 / 3)
    # doc 1: stems spark×4, engin×2 → tf(engin)=0.5
    assert tfs[("spark", 1)] == pytest.approx(1.0)
    assert tfs[("engin", 1)] == pytest.approx(0.5)
    for term, plist in oidx.postings.items():
        for doc_id, tf in plist.items():
            assert tfs[(term, doc_id)] == pytest.approx(tf)


def test_idf_formula(idx):
    rows = {r["term"]: r for r in idx.dictionary.collect()}
    n = idx.n_docs
    for term, r in rows.items():
        assert r["idf"] == pytest.approx(
            math.log2((n - r["df"] + 0.5) / (r["df"] + 0.5))
        )


def test_vsm_norms(idx, oidx):
    norms = {r["doc_id"]: r["norm"] for r in idx.doc_stats.collect()}
    expect = {}
    for term, plist in oidx.postings.items():
        idf = math.log2(oidx.n_docs / len(plist))
        for doc_id, tf in plist.items():
            expect[doc_id] = expect.get(doc_id, 0.0) + (tf * idf) ** 2
    for doc_id, v in expect.items():
        assert norms[doc_id] == pytest.approx(math.sqrt(v))


def test_merge_equivalence_partitions(spark, tiny_docs_df):
    """SURVEY.md §5: 1 partition ≡ 8 partitions — the shuffle IS the merge."""
    one = build_index(tiny_docs_df.coalesce(1), stem=True)
    eight = build_index(tiny_docs_df.repartition(8), stem=True)
    a = {(r["term"], r["doc_id"]): round(r["tf"], 12)
         for r in one.postings_flat.collect()}
    b = {(r["term"], r["doc_id"]): round(r["tf"], 12)
         for r in eight.postings_flat.collect()}
    assert a == b
    assert one.n_docs == eight.n_docs
    assert one.avgdl == pytest.approx(eight.avgdl)


def test_save_load_roundtrip(spark, tiny_docs_df, tmp_path, idx):
    from themis_search_engine_spark.indexing.build import load_index, save_index

    save_index(idx, str(tmp_path / "idx"), term_buckets=4)
    idx2 = load_index(spark, str(tmp_path / "idx"))
    a = sorted(map(tuple, idx.postings_flat.collect()))
    b = sorted(
        map(
            tuple,
            idx2.postings_flat.select("term", "doc_id", "tf", "length").collect(),
        )
    )
    assert a == b
    assert idx2.n_docs == idx.n_docs


def test_prune_postings_keeps_top_impact(spark):
    """Pruning keeps exactly per_term postings per term (tf desc, doc_id
    ties) and is invariant to the salted two-phase decomposition."""
    from themis_search_engine_spark.indexing.prune import prune_postings

    rows = [
        ("t", d, tf, 10) for d, tf in
        [(0, 1.0), (1, 0.5), (2, 1.0), (3, 0.25), (4, 0.75)]
    ] + [("u", 0, 1.0, 10)]
    posts = spark.createDataFrame(
        rows, "term string, doc_id long, tf double, length long"
    )
    got = {
        (r.term, r.doc_id)
        for r in prune_postings(posts, per_term=3).collect()
    }
    # t keeps tf-1.0 docs 0,2 then 0.75 doc 4; u keeps its only posting
    assert got == {("t", 0), ("t", 2), ("t", 4), ("u", 0)}
    # extra columns survive
    cols = prune_postings(posts, per_term=3).columns
    assert "length" in cols
