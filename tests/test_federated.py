"""Federated multi-index retrieval (queryeng/federated.py): scoring N
independently-built sub-indexes with merged global stats must be
rank-identical to one index over the union corpus — and provably would
NOT be without the global-stats phase (the distributed-IR pitfall the
module exists to fix).
"""

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import (
    federated_topk,
    merged_global_stats,
    qterms_df,
)
from themis_search_engine_spark.queryeng.bm25 import bm25_score_all, topk

# Skewed on purpose: "fox" is rare in one half and common in the other,
# so local-df scoring visibly disagrees with union-corpus scoring.
DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "sparking sparks spark sparked in the engine engine",
    2: "a lazy dog and another lazy lazy dog",
    3: "fox fox den",
    4: "quick queries query the index indexes indexing",
    5: "fox field fox trot fox",
    6: "engine engine engine room",
    7: "dog walker walks a dog",
    8: "query the fox index quickly",
    9: "lazy summer day by the engine",
}
QUERIES = {1: "lazy dog", 2: "fox engine", 3: "quick query"}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id long, text string"
    )


def _splits(docs_df, n):
    return tuple(
        build_index(
            docs_df.where(F.pmod("doc_id", F.lit(n)) == i),
            stem=False, use_arrow=False,
        ).cache()
        for i in range(n)
    )


def _ranked(rows):
    out = {}
    for r in rows:
        out.setdefault(r["qid"], []).append((r["rank"], r["doc_id"]))
    return {q: [d for _, d in sorted(v)] for q, v in out.items()}


def test_merged_stats_exact(spark, docs_df):
    """N, avgdl, and per-term df merged across sub-indexes equal the
    union index's own stats — the exactness claim of step 1."""
    union = build_index(docs_df, stem=False, use_arrow=False)
    for n in (2, 3):
        gdict, n_total, avgdl = merged_global_stats(_splits(docs_df, n))
        assert n_total == union.n_docs
        assert avgdl == pytest.approx(union.avgdl)
        got = {r["term"]: r["df"] for r in gdict.collect()}
        want = {r["term"]: r["df"] for r in union.dictionary.collect()}
        assert got == want


@pytest.mark.parametrize("n", [2, 3])
def test_federated_rank_identical_to_union(spark, docs_df, n):
    union = build_index(docs_df, stem=False, use_arrow=False).cache()
    qt = qterms_df(spark, QUERIES)
    single = _ranked(
        topk(
            bm25_score_all(
                qt, union.postings_flat, union.dictionary,
                union.doc_stats, union.avgdl,
            ),
            k=5,
        ).collect()
    )
    fed = _ranked(federated_topk(qt, _splits(docs_df, n), k=5).collect())
    assert fed == single


def test_local_stats_would_disagree(spark, docs_df):
    """Negative control: scoring each half with its LOCAL (df, N, avgdl)
    — the naive federation the module's docstring warns about — yields
    scores that disagree with union-corpus scores on the skewed corpus
    (the incomparability pitfall itself). The globally-scored legs, by
    contrast, reproduce every union score exactly. If the naive check
    ever stops failing, the global-stats phase stopped being
    load-bearing."""
    from functools import reduce

    from pyspark.sql import DataFrame

    from themis_search_engine_spark.queryeng.federated import (
        federated_scores,
    )

    union = build_index(docs_df, stem=False, use_arrow=False).cache()
    qt = qterms_df(spark, QUERIES)

    def score_map(df):
        return {
            (r["qid"], r["doc_id"]): round(r["score"], 6)
            for r in df.collect()
        }

    want = score_map(
        bm25_score_all(
            qt, union.postings_flat, union.dictionary,
            union.doc_stats, union.avgdl,
        )
    )
    halves = _splits(docs_df, 2)
    naive = score_map(
        reduce(
            DataFrame.unionByName,
            [
                bm25_score_all(
                    qt, ix.postings_flat, ix.dictionary,
                    ix.doc_stats, ix.avgdl,
                )
                for ix in halves
            ],
        )
    )
    assert naive != want  # local stats: scores not comparable

    fed = score_map(
        reduce(DataFrame.unionByName, federated_scores(qt, halves))
    )
    assert fed == want  # merged stats: exactly the union-index scores


def test_select_shards_bounded(spark, docs_df):
    from themis_search_engine_spark.queryeng.federated import select_shards

    qt = qterms_df(spark, QUERIES)
    sel = select_shards(qt, _splits(docs_df, 3), m=2).collect()
    per_q = {}
    for r in sel:
        per_q.setdefault(r["qid"], set()).add(r["shard"])
    assert per_q  # at least one query routed
    assert all(len(s) <= 2 for s in per_q.values())
    assert all(0 <= sh < 3 for s in per_q.values() for sh in s)


def test_selective_full_selection_equals_federated(spark, docs_df):
    """m = n_shards selects every shard — selective search must then be
    exactly federated search (routing is the ONLY thing it changes)."""
    from themis_search_engine_spark.queryeng.federated import selective_topk

    qt = qterms_df(spark, QUERIES)
    halves = _splits(docs_df, 2)
    fed = sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in federated_topk(qt, halves, k=5, round_dp=6).collect()
    )
    sel = sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in selective_topk(qt, halves, k=5, m=2, round_dp=6).collect()
    )
    assert sel == fed


def test_selective_score_fidelity(spark, docs_df):
    """Every (qid, doc) selective search returns carries the UNION
    index's exact score — selection bounds recall, never score values."""
    from themis_search_engine_spark.queryeng.federated import selective_topk

    union = build_index(docs_df, stem=False, use_arrow=False).cache()
    qt = qterms_df(spark, QUERIES)
    want = {
        (r["qid"], r["doc_id"]): round(r["score"], 6)
        for r in bm25_score_all(
            qt, union.postings_flat, union.dictionary,
            union.doc_stats, union.avgdl,
        ).collect()
    }
    got = selective_topk(qt, _splits(docs_df, 3), k=5, m=1, round_dp=6)
    rows = got.collect()
    assert rows
    for r in rows:
        assert round(r["score"], 6) == want[(r["qid"], r["doc_id"])]


def test_federated_wand_equals_union(spark, docs_df, tmp_path):
    """Compressed-serving federation: two on-disk serving indexes with
    DIFFERENT encode-time avgdls (short docs in one leg, long in the
    other, so the per-leg bound scales are exercised in both
    directions), queried via block-max WAND with merged stats — rank-
    and score-identical (at 6 dp) to the union index's naive plan."""
    from pyspark.sql.window import Window

    from themis_search_engine_spark.indexing.build import (
        build_and_save_serving,
        load_serving_index,
    )
    from themis_search_engine_spark.queryeng.federated import (
        federated_wand_topk,
    )

    # split by doc LENGTH so leg avgdls genuinely differ
    short = docs_df.where(F.length("text") < 40)
    long_ = docs_df.where(F.length("text") >= 40)
    legs = []
    for name, part in (("short", short), ("long", long_)):
        p = str(tmp_path / name)
        build_and_save_serving(part, p, stem=False, partitions=4)
        legs.append(load_serving_index(spark, p))
    assert legs[0].avgdl != legs[1].avgdl  # scales non-trivial both ways

    qt = qterms_df(spark, QUERIES, stem=False)
    got = sorted(
        tuple(r)
        for r in federated_wand_topk(qt, legs, k=5, round_dp=6).collect()
    )

    union = build_index(docs_df, stem=False, use_arrow=False).cache()
    scored = bm25_score_all(
        qt, union.postings_flat, union.dictionary, union.doc_stats,
        union.avgdl,
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    want = sorted(
        tuple(r)
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= 5)
        .select("qid", "doc_id", F.round("score", 6).alias("score"), "rank")
        .collect()
    )
    assert got == want


def test_selective_wand_matches_logical_plan(spark, docs_df, tmp_path):
    """Routing and scores are plan-independent: selective search on the
    compressed serving path returns exactly what the logical-table plan
    returns for the same shard split."""
    from themis_search_engine_spark.indexing.build import (
        build_and_save_serving,
        load_serving_index,
    )
    from themis_search_engine_spark.queryeng.federated import (
        selective_topk,
        selective_wand_topk,
    )

    n = 3
    legs = []
    for i in range(n):
        p = str(tmp_path / f"leg{i}")
        build_and_save_serving(
            docs_df.where(F.pmod("doc_id", F.lit(n)) == i), p,
            stem=False, partitions=4,
        )
        legs.append(load_serving_index(spark, p))
    qt = qterms_df(spark, QUERIES, stem=False)
    wand = sorted(
        tuple(r)
        for r in selective_wand_topk(
            qt, legs, k=5, m=2, round_dp=6
        ).collect()
    )
    logical = sorted(
        tuple(r)
        for r in selective_topk(
            qt, _splits(docs_df, n), k=5, m=2, round_dp=6
        ).collect()
    )
    assert wand == logical and wand


def test_federated_scan_filter_per_leg_identity(spark, docs_df, tmp_path):
    """r5: each federated leg takes the measured IN-list-vs-join-only
    decision for ITS dictionary cardinality, and the two filter shapes
    are result-identical — a dense batch vocabulary (join_only branch)
    federates to exactly the union oracle, same as the sparse (inlist)
    batch the other tests use."""
    from pyspark.sql.window import Window

    from themis_search_engine_spark.indexing.build import (
        build_and_save_serving,
        load_serving_index,
    )
    from themis_search_engine_spark.queryeng.federated import (
        federated_wand_topk,
    )
    from themis_search_engine_spark.queryeng.planner import (
        choose_scan_filter,
    )

    legs = []
    for i in range(2):
        p = str(tmp_path / f"leg{i}")
        build_and_save_serving(
            docs_df.where(F.pmod("doc_id", F.lit(2)) == i), p,
            stem=False, partitions=4,
        )
        legs.append(load_serving_index(spark, p))
    assert all(ix.n_terms > 0 for ix in legs)  # persisted cardinality

    # a batch whose vocabulary covers (almost) the whole dictionary:
    # every doc's words become one giant query plus the normal ones
    dense = dict(QUERIES)
    dense[99] = " ".join(DOCS.values())
    qt = qterms_df(spark, dense, stem=False)
    vocab = sorted(
        {t for r in qt.select("term").distinct().collect() for t in [r[0]]}
    )
    # pin: dense coverage takes join_only on every leg, the sparse
    # 3-query batch takes inlist
    for ix in legs:
        assert choose_scan_filter(len(vocab), ix.n_terms)[
            "filter"] == "join_only"
        assert choose_scan_filter(1, ix.n_terms)["filter"] == "inlist"

    got = sorted(
        tuple(r)
        for r in federated_wand_topk(
            qt, legs, k=5, round_dp=6, term_list=vocab
        ).collect()
    )
    # identity vs the union-index oracle (the INLIST_CROSSOVER contract:
    # the filter choice is physical only)
    union = build_index(docs_df, stem=False, use_arrow=False).cache()
    scored = bm25_score_all(
        qt, union.postings_flat, union.dictionary, union.doc_stats,
        union.avgdl,
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    want = sorted(
        tuple(r)
        for r in scored.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank") <= 5)
        .select("qid", "doc_id", F.round("score", 6).alias("score"), "rank")
        .collect()
    )
    assert got == want and len(want) > 0
