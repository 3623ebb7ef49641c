"""Metadata-filtered retrieval + facet counts (queryeng/metadata.py).

Correctness: filtered top-k returns the next-best MATCHING docs (never a
post-filter of the unfiltered top-k), every hit satisfies the predicate,
facet counts reconcile with the distinct existential match set.
Plan: predicate reaches the attribute parquet scan as a pushed filter;
the batch term IN-list stays pushed on the postings scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.metadata import (
    bm25_topk_filtered,
    facet_counts,
    matching_docs,
)

DOCS = [
    # doc_id, text, lang
    (0, "spark shuffle join spark", "en"),
    (1, "spark shuffle join", "en"),
    (2, "spark join shuffle merge", "de"),
    (3, "spark spark spark shuffle join", "de"),
    (4, "window order group", "en"),
    (5, "shuffle", "fr"),
    (6, "join join join", "en"),
    (7, "unrelated words only here", "en"),
]

QS = {1: "spark shuffle join", 2: "window order group"}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


@pytest.fixture(scope="module")
def midx(docs_df):
    return build_index(docs_df.select("doc_id", "text")).cache()


def test_filtered_hits_satisfy_predicate_and_refill(spark, docs_df, midx):
    qt = qterms_df(spark, QS)
    ranked = bm25_topk_filtered(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl,
        docs_df, F.col("lang") == "en", k=3,
    ).collect()
    en_docs = {r["doc_id"] for r in docs_df.where("lang = 'en'").collect()}
    assert ranked and all(r["doc_id"] in en_docs for r in ranked)
    # qid 1 has en matches {0, 1, 6}: the filtered top-3 must surface ALL
    # of them — doc 6 would be pushed out by de docs in the unfiltered
    # top-3, so its presence proves the filter sits below top-k (refill),
    # not above it (post-filter).
    q1 = {r["doc_id"] for r in ranked if r["qid"] == 1}
    assert q1 == {0, 1, 6}


def test_filtered_is_not_post_filtered_topk(spark, docs_df, midx):
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all, topk

    qt = qterms_df(spark, {1: "spark shuffle join"})
    unfiltered = topk(
        bm25_score_all(
            qt, midx.postings_flat, midx.dictionary, midx.doc_stats,
            midx.avgdl,
        ),
        3,
    ).collect()
    post = [r for r in unfiltered if r["doc_id"] in {0, 1, 6}]
    filtered = bm25_topk_filtered(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl,
        docs_df, F.col("lang") == "en", k=3,
    ).collect()
    assert len(filtered) == 3 and len(post) < 3


def test_facet_counts_reconcile(spark, docs_df, midx):
    qt = qterms_df(spark, QS)
    facets = facet_counts(qt, midx.postings_flat, docs_df, ("lang",))
    rows = facets.collect()
    got = {(r["qid"], r["lang"]): r["n_docs"] for r in rows}
    # qid 1 'spark shuffle join': en {0,1,6}, de {2,3}, fr {5}
    assert got[(1, "en")] == 3 and got[(1, "de")] == 2 and got[(1, "fr")] == 1
    # qid 2 'window order group': only doc 4 (en)
    assert got[(2, "en")] == 1 and (2, "de") not in got
    # facet total per qid == distinct match count
    cand = matching_docs(qt, midx.postings_flat)
    per_qid = {
        r["qid"]: r["n"]
        for r in cand.groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    for qid in (1, 2):
        assert sum(v for (q, _l), v in got.items() if q == qid) == per_qid[qid]


def test_filter_pushdown_in_plan(spark, tmp_path, docs_df, midx):
    # persist attrs to parquet so the predicate has a scan to push into
    attr_path = str(tmp_path / "attrs")
    docs_df.select("doc_id", "lang").write.parquet(attr_path)
    attrs = spark.read.parquet(attr_path)
    qt = qterms_df(spark, {1: "spark shuffle join"})
    plan = bm25_topk_filtered(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl,
        attrs.withColumn("doc_id", F.col("doc_id")), F.col("lang") == "en",
        k=3,
    )._jdf.queryExecution().toString()
    # executedPlan().toString() truncates per-node fields; the full
    # queryExecution dump keeps the FileScan's PushedFilters list.
    assert "EqualTo(lang,en)" in plan and "PushedFilters" in plan


def test_collapse_topk_caps_groups_and_refills(spark):
    """At most per_group hits per source; displaced slots refill with
    lower-scored docs from other sources."""
    from themis_search_engine_spark.queryeng.metadata import collapse_topk

    scored = spark.createDataFrame(
        [(1, d, 10.0 - d) for d in range(6)],  # doc 0 best … doc 5 worst
        "qid long, doc_id long, score double",
    )
    attrs = spark.createDataFrame(
        # docs 0,1,2 share host A; 3,4 host B; 5 host C
        [(0, "A"), (1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "C")],
        "doc_id long, source string",
    )
    out = collapse_topk(scored, attrs, "source", 2, 4).collect()
    ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 2 (third A) is collapsed out; rank order by score: 0,1 (A),
    # 3,4 (B) — doc 5 misses k=4
    assert ids == [0, 1, 3, 4]
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4]


def test_related_terms_pmi(spark):
    """PMI pin on a corpus where co-occurrence is hand-computable."""
    import math

    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng.related import related_terms

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle cluster"),
            (1, "spark shuffle cluster"),
            (2, "spark cluster"),
            (3, "cluster alone here"),
            (4, "alone words here"),
            (5, "words words alone"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, stem=False).cache()
    qt = qterms_df(spark, {1: "spark"})
    out = related_terms(
        qt, idx.postings_flat, idx.counts, idx.dictionary, idx.n_docs,
        top_n=3, min_df=2,
    ).collect()
    got = {r["term"]: (r["pmi"], r["rank"]) for r in out}
    # match(spark) = {0,1,2} (q_df=3); shuffle co_df=2, df=2 →
    # pmi = log2(2*6/(3*2)) = 1; cluster co_df=3, df=4 → log2(18/12)
    assert "spark" not in got  # own term excluded
    assert got["shuffle"][0] == pytest.approx(1.0)
    assert got["cluster"][0] == pytest.approx(round(math.log2(3 * 6 / (3 * 4)), 6))
    # shuffle (pmi 1) outranks cluster (pmi ~0.585)
    assert got["shuffle"][1] < got["cluster"][1]


def test_spell_suggest_and_autocomplete(spark):
    from themis_search_engine_spark.queryeng.spell import (
        autocomplete,
        spell_suggest,
    )

    dictionary = spark.createDataFrame(
        [("spark", 100), ("spars", 40), ("sharp", 30), ("window", 80),
         ("shuffle", 60), ("join", 90)],
        "term string, df long",
    )
    terms = spark.createDataFrame(
        [("spak",), ("windoq",), ("zzzz",)], "term string"
    )
    got = spell_suggest(terms, dictionary, top_n=2).collect()
    by_term = {}
    for r in sorted(got, key=lambda r: (r["term"], r["rank"])):
        by_term.setdefault(r["term"], []).append(r["suggestion"])
    # spak: spark (del-a vs ins? lev=1, df 100) and spars? lev(spak,spars)=2
    # -> excluded by verify even though they share no deletion key anyway
    assert by_term["spak"] == ["spark"]
    assert by_term["windoq"] == ["window"]
    assert "zzzz" not in by_term  # no distance-1 neighbor
    comp = autocomplete(
        spark.createDataFrame([("sp",), ("j",)], "prefix string"),
        dictionary, top_n=2,
    ).collect()
    by_p = {}
    for r in sorted(comp, key=lambda r: (r["prefix"], r["rank"])):
        by_p.setdefault(r["prefix"], []).append(r["suggestion"])
    assert by_p["sp"] == ["spark", "spars"]  # df desc
    assert by_p["j"] == ["join"]


def test_conjunctive_scores_and_min_match(spark, docs_df, midx):
    from themis_search_engine_spark.queryeng.metadata import (
        conjunctive_scores,
    )

    qt = qterms_df(spark, {1: "spark shuffle join"})
    # AND: docs containing all of {spark, shuffle, join}: 0, 1, 2, 3
    strict = conjunctive_scores(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl
    ).collect()
    assert {r["doc_id"] for r in strict} == {0, 1, 2, 3}
    # min_match=1 == OR semantics (adds single-term docs 5, 6)
    loose = conjunctive_scores(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl,
        min_match=1,
    ).collect()
    assert {r["doc_id"] for r in loose} == {0, 1, 2, 3, 5, 6}
    # min_match=2: docs with >= 2 of the terms
    two = conjunctive_scores(
        qt, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl,
        min_match=2,
    ).collect()
    assert {r["doc_id"] for r in two} == {0, 1, 2, 3}
    # unknown terms are excluded from the requirement: adding one to the
    # query must not empty the AND result
    qt2 = qterms_df(spark, {1: "spark shuffle join zzzzunknown"})
    still = conjunctive_scores(
        qt2, midx.postings_flat, midx.dictionary, midx.doc_stats, midx.avgdl
    ).collect()
    assert {r["doc_id"] for r in still} == {0, 1, 2, 3}
    # conjunctive scores equal the OR scorer's scores for qualifying docs
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all

    or_scores = {
        (r["qid"], r["doc_id"]): round(r["score"], 9)
        for r in bm25_score_all(
            qt, midx.postings_flat, midx.dictionary, midx.doc_stats,
            midx.avgdl,
        ).collect()
    }
    for r in strict:
        assert round(r["score"], 9) == or_scores[(r["qid"], r["doc_id"])]


def test_phrase_search_adjacency(spark):
    """Exact adjacency: overlapping occurrences counted, word-set matches
    without adjacency rejected, stopwords participate in phrases."""
    from themis_search_engine_spark.queryeng.phrase import (
        phrase_occurrences,
        phrase_topk,
        positional_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "state of the art results"),
            (1, "the art of state"),          # same words, wrong order
            (2, "state of the art of the art"),  # 1x phrase + suffix echo
            (3, "a a a a"),                   # overlapping self-phrase
        ],
        "doc_id long, text string",
    )
    pos = positional_index(docs)
    occ = phrase_occurrences(pos, ["state", "of", "the", "art"]).collect()
    got = {(r["doc_id"], r["pos"]) for r in occ}
    assert got == {(0, 1), (2, 1)}
    # overlapping bigram "a a": 3 occurrences at pos 1,2,3
    top = phrase_topk(pos, {1: ["a", "a"]}, k=5).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in top] == [(3, 3)]


def test_persisted_positional_index_pruned_scan(spark, tmp_path):
    """Persisted positional layout: phrase queries read it with the term
    IN-list pushed to the parquet scan, and results equal the in-memory
    positional index."""
    from themis_search_engine_spark.queryeng.phrase import (
        load_positional_index,
        phrase_topk,
        positional_index,
        save_positional_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta alpha beta number {i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "pos")
    save_positional_index(docs, p, partitions=4)
    stored = load_positional_index(spark, p)
    phrases = {1: ["alpha", "beta"], 2: ["beta", "gamma"]}
    a = sorted(map(tuple, phrase_topk(stored, phrases, k=5).collect()))
    b = sorted(map(tuple, phrase_topk(positional_index(docs), phrases, k=5).collect()))
    assert a == b and a
    plan = phrase_topk(stored, {1: ["alpha", "beta"]}, k=5)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "In(term, [alpha,beta]" in plan


def test_phrase_proximity_gap_semantics(spark):
    """max_gap proximity: ordered, each next term within 1+gap tokens;
    counts are distinct start positions; gap=0 equals exact adjacency."""
    from themis_search_engine_spark.queryeng.phrase import (
        phrase_occurrences,
        positional_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark big join"),         # gap 1 between spark and join
            (1, "spark join"),             # adjacent
            (2, "spark very big join"),    # gap 2 — beyond max_gap=1
            (3, "join spark"),             # wrong order
            (4, "spark join join"),        # one start, two chain ends
        ],
        "doc_id long, text string",
    )
    pos = positional_index(docs)
    near = phrase_occurrences(pos, ["spark", "join"], max_gap=1).collect()
    got = {(r["doc_id"], r["pos"]) for r in near}
    assert got == {(0, 1), (1, 1), (4, 1)}  # distinct STARTS (doc 4 once)
    exact = phrase_occurrences(pos, ["spark", "join"], max_gap=0).collect()
    assert {(r["doc_id"], r["pos"]) for r in exact} == {(1, 1), (4, 1)}


def test_phrase_topk_empty_phrases_raises(spark):
    from themis_search_engine_spark.queryeng.phrase import phrase_topk

    pos = spark.createDataFrame([], "doc_id long, term string, pos long")
    with pytest.raises(ValueError, match="empty phrases"):
        phrase_topk(pos, {})


def test_autocomplete_range_form_equals_join_form(spark, tmp_path):
    """autocomplete_terms (range predicates, pushable) returns exactly
    the join form's rows, and the range bounds reach the parquet scan."""
    from themis_search_engine_spark.queryeng.spell import (
        autocomplete,
        autocomplete_terms,
    )

    rows = [("spark", 100), ("spars", 40), ("spa", 70), ("sharp", 30),
            ("window", 80), ("join", 90), ("sp", 5)]
    d = spark.createDataFrame(rows, "term string, df long")
    path = str(tmp_path / "dict")
    d.write.parquet(path)
    stored = spark.read.parquet(path)
    prefixes = ["sp", "wi", "zz"]
    a = sorted(map(tuple, autocomplete_terms(stored, prefixes, 3).collect()))
    pdf = spark.createDataFrame([(p,) for p in prefixes], "prefix string")
    b = sorted(map(tuple, autocomplete(pdf, stored, 3).collect()))
    assert a == b and a
    plan = autocomplete_terms(stored, ["sp"], 3)._jdf.queryExecution().toString()
    assert "GreaterThanOrEqual(term,sp)" in plan and "LessThan(term,sq)" in plan


def test_negated_scores_excludes_matching_docs(spark, docs_df, midx):
    from themis_search_engine_spark.queryeng.metadata import negated_scores

    qt = qterms_df(spark, {1: "spark shuffle join", 2: "spark"})
    base = negated_scores(
        qt, qterms_df(spark, {}), midx.postings_flat, midx.dictionary,
        midx.doc_stats, midx.avgdl,
    ).collect()
    # no negations: identical doc set to the OR scorer
    base_docs = {(r["qid"], r["doc_id"]) for r in base}

    neg = qterms_df(spark, {1: "shuffle"})
    out = negated_scores(
        qt, neg, midx.postings_flat, midx.dictionary,
        midx.doc_stats, midx.avgdl,
    ).collect()
    out_docs = {(r["qid"], r["doc_id"]) for r in out}
    # qid 1 loses every doc containing 'shuffle' (as processed by the
    # same query pipeline the index was built with)
    neg_terms = [r["term"] for r in neg.select("term").collect()]
    shuffled = {
        r["doc_id"]
        for r in midx.postings_flat.where(
            F.col("term").isin(neg_terms)
        ).collect()
    }
    assert shuffled  # fixture sanity
    assert not {(1, d) for d in shuffled} & out_docs
    assert {(1, d) for d in shuffled} <= base_docs
    # qid 2 (no negations) untouched
    assert {p for p in out_docs if p[0] == 2} == {
        p for p in base_docs if p[0] == 2
    }
    # scores of surviving docs identical to the un-negated plan
    base_s = {(r["qid"], r["doc_id"]): r["score"] for r in base}
    for r in out:
        assert abs(base_s[(r["qid"], r["doc_id"])] - r["score"]) < 1e-12


def test_prefix_qterms_expansion_and_cap(spark):
    """prefix_qterms: completions come from the range-scan expansion,
    capped per prefix at max_terms by (df desc, term asc), qweight 1."""
    from themis_search_engine_spark.queryeng.spell import prefix_qterms

    dictionary = spark.createDataFrame(
        [("spark", 50, 1.0), ("sparse", 30, 1.0), ("spartan", 30, 1.0),
         ("sparing", 10, 1.0), ("shuffle", 40, 1.0), ("zeta", 5, 1.0)],
        "term string, df long, idf double",
    )
    qt = prefix_qterms(spark, dictionary, {1: "spar", 2: "sh"}, max_terms=3)
    rows = sorted((r["qid"], r["term"], r["qweight"]) for r in qt.collect())
    # cap=3 keeps spark(50), then the df tie sparse<spartan by term asc
    assert rows == [
        (1, "spark", 1.0), (1, "sparse", 1.0), (1, "spartan", 1.0),
        (2, "shuffle", 1.0),
    ]


def test_prefix_topk_matches_manual_or_query(spark):
    """A prefix query scores exactly as the OR of its expansions fed to
    the standard BM25 plan."""
    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng import bm25_topk, qterms_df
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
    from themis_search_engine_spark.queryeng.spell import prefix_qterms

    docs = spark.createDataFrame(
        [(1, "spark shuffle join"), (2, "sparse matrix spark"),
         (3, "spartan discipline"), (4, "unrelated words here")],
        "doc_id long, text string",
    )
    idx = build_index(docs, stem=False)
    qt = prefix_qterms(spark, idx.dictionary, {1: "spar"}, max_terms=16)
    got = bm25_score_all(qt, idx.postings_flat, idx.dictionary,
                         idx.doc_stats, idx.avgdl)
    manual = qterms_df(spark, {1: "spark sparse spartan"}, stem=False)
    want = bm25_score_all(manual, idx.postings_flat, idx.dictionary,
                          idx.doc_stats, idx.avgdl)
    g = {(r["qid"], r["doc_id"]): round(r["score"], 9) for r in got.collect()}
    w = {(r["qid"], r["doc_id"]): round(r["score"], 9) for r in want.collect()}
    assert g == w and len(g) == 3


def test_mmr_demotes_near_duplicates(spark):
    """Three relevant docs: #2 is nearly identical to #1, #3 is
    orthogonal but slightly less relevant. Plain relevance order is
    1,2,3; MMR must pick the diverse #3 second."""
    from themis_search_engine_spark.queryeng.mmr import mmr_py, mmr_rerank

    pool = [
        (1, 1.00, [1.0, 0.0, 0.0]),
        (2, 0.99, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, 0.90, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    picks = mmr_py(pool, k=3, lam=0.7)
    assert picks == [(1, 1), (3, 2), (2, 3)]

    # the Spark group path produces exactly the pure-Python selection
    pdf = spark.createDataFrame(
        [(7, d, r) for d, r, _ in pool], "qid long, doc_id long, score double"
    )
    embs = spark.createDataFrame(
        [(d, v) for d, _, v in pool], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["doc_id"], r["rank"])
        for r in mmr_rerank(pdf, embs, k=3, lam=0.7).collect()
    )
    assert got == sorted(picks)


def test_mmr_pool_smaller_than_k_and_missing_embedding(spark):
    """k larger than the pool returns the whole pool ranked; a candidate
    without an embedding row drops out (inner join semantics)."""
    from themis_search_engine_spark.queryeng.mmr import mmr_rerank

    pdf = spark.createDataFrame(
        [(1, 10, 0.9), (1, 20, 0.8), (1, 30, 0.7)],
        "qid long, doc_id long, score double",
    )
    embs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])],  # 30 unembedded
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r["doc_id"], r["rank"])
        for r in mmr_rerank(pdf, embs, k=5, lam=0.7).collect()
    )
    assert got == [(10, 1), (20, 2)]


def test_fuzzy_qterms_neighborhood_and_cap(spark):
    from themis_search_engine_spark.queryeng.spell import fuzzy_qterms

    dictionary = spark.createDataFrame(
        [("spark", 100), ("spars", 40), ("stark", 30), ("shark", 20),
         ("join", 90), ("spam", 10)],
        "term string, df long",
    )
    out = fuzzy_qterms(
        spark, dictionary, {1: "spark", 2: "jion", 3: "zzzz"}, max_terms=2
    ).collect()
    by_qid = {}
    for r in sorted(out, key=lambda r: (r["qid"], r["term"])):
        by_qid.setdefault(r["qid"], []).append(r["term"])
    # qid 1: full distance-1 neighborhood of an IN-dictionary term is
    # {spark itself, spars, stark, shark} — capped at 2 by df desc
    assert by_qid[1] == ["spark", "spars"]
    # qid 2: 'jion' vs 'join' is a transposition = levenshtein 2 -> no hit
    assert 2 not in by_qid
    assert 3 not in by_qid
    assert all(r["qweight"] == 1.0 for r in out)


def test_fuzzy_qterms_verify_is_candidate_bounded(spark):
    """The plan must contain no cross join / full-vocab levenshtein:
    candidates come from the deletion-key equi-join only."""
    from themis_search_engine_spark.queryeng.spell import fuzzy_qterms

    dictionary = spark.createDataFrame(
        [("spark", 100), ("join", 90)], "term string, df long"
    )
    plan = (
        fuzzy_qterms(spark, dictionary, {1: "spak"})
        ._jdf.queryExecution().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compound_split_qterms(spark):
    from themis_search_engine_spark.queryeng.spell import (
        compound_split_qterms,
    )

    dictionary = spark.createDataFrame(
        [("hash", 90), ("join", 80), ("ha", 5), ("shjoin", 5),
         ("window", 70), ("big", 60), ("data", 50)],
        "term string, df long",
    )
    out = compound_split_qterms(
        spark, dictionary,
        {1: "hashjoin", 2: "window", 3: "zzzz", 4: "bigdata"},
    ).collect()
    by_qid = {}
    for r in sorted(out, key=lambda r: (r["qid"], r["term"])):
        by_qid.setdefault(r["qid"], []).append(r["term"])
    # best split by least-df: hash|join (min 80) beats ha|shjoin (min 5)
    assert by_qid[1] == ["hash", "join"]
    assert by_qid[2] == ["window"]   # in-dictionary: no split attempted
    assert by_qid[3] == ["zzzz"]     # unsplittable: verbatim passthrough
    assert by_qid[4] == ["big", "data"]


def test_sort_by_field_topk(spark):
    from themis_search_engine_spark.queryeng.metadata import (
        sort_by_field_topk,
    )

    qterms = spark.createDataFrame(
        [(1, "alpha", 1.0), (2, "beta", 1.0)],
        "qid int, term string, qweight double",
    )
    postings = spark.createDataFrame(
        [("alpha", 10, 1), ("alpha", 11, 1), ("alpha", 12, 1),
         ("beta", 11, 2)],
        "term string, doc_id long, cnt long",
    )
    attrs = spark.createDataFrame(
        [(10, 100), (11, 300), (12, 300)], "doc_id long, ts long"
    )
    out = sort_by_field_topk(qterms, postings, attrs, "ts", k=2)
    got = {
        (r["qid"], r["rank"]): (r["doc_id"], r["sort_val"])
        for r in out.collect()
    }
    # qid 1: ts desc, doc_id asc tiebreak between 11 and 12; k=2 cuts 10
    assert got[(1, 1)] == (11, 300) and got[(1, 2)] == (12, 300)
    assert (1, 3) not in got
    assert got[(2, 1)] == (11, 300)
    # ascending flips the order
    asc = sort_by_field_topk(qterms, postings, attrs, "ts", k=1,
                             ascending=True)
    assert [(r["qid"], r["doc_id"]) for r in asc.collect()
            if r["qid"] == 1] == [(1, 10)]
    # rank <= k compiles to WindowGroupLimit: per-task k-row heaps, a
    # head-term match set never fully sorts in one place
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_common_terms_topk(spark):
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
    from themis_search_engine_spark.queryeng.metadata import (
        common_terms_topk,
    )

    # 'hot' matches 4/5 docs (common at frac 0.5), 'rare' matches 1
    postings = spark.createDataFrame(
        [("hot", 10, 1.0, 3), ("hot", 11, 1.0, 3), ("hot", 12, 1.0, 3),
         ("hot", 13, 0.5, 3), ("rare", 13, 1.0, 3)],
        "term string, doc_id long, tf double, length long",
    )
    dictionary = spark.createDataFrame(
        [("hot", 4, 0.3), ("rare", 1, 2.0)], "term string, df long, idf double"
    )
    doc_stats = spark.createDataFrame(
        [(d, 3, 2) for d in (10, 11, 12, 13)],
        "doc_id long, length long, maxcnt long",
    )
    qterms = spark.createDataFrame(
        [(1, "hot", 1, 1.0), (1, "rare", 1, 1.0), (2, "hot", 1, 1.0)],
        "qid int, term string, qtf long, qweight double",
    )
    out = common_terms_topk(
        qterms, postings, dictionary, doc_stats, 3.0, 5, k=10,
        max_df_frac=0.5,
    )
    rows = {(r["qid"], r["doc_id"]): r["score"] for r in out.collect()}
    # qid 1: only doc 13 matched the rare term → common-only docs drop
    assert {q_d for q_d in rows if q_d[0] == 1} == {(1, 13)}
    # the survivor's score is the FULL OR sum (both terms contribute)
    full = {
        (r["qid"], r["doc_id"]): r["score"]
        for r in bm25_score_all(
            qterms, postings, dictionary, doc_stats, 3.0
        ).collect()
    }
    assert abs(rows[(1, 13)] - full[(1, 13)]) < 1e-12
    # qid 2: all terms common → plain-OR fallback keeps every match
    assert {d for (q, d) in rows if q == 2} == {10, 11, 12, 13}


def test_grouped_topk_shape(spark, tiny_docs_df):
    """Group-major invariants: ≤ n_groups groups per qid with dense
    group_rank, ≤ per_group inner hits per group with dense inner_rank,
    and group order follows each group's best (rounded) score."""
    from themis_search_engine_spark.indexing import build_index
    from themis_search_engine_spark.queryeng import qterms_df
    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
    from themis_search_engine_spark.queryeng.metadata import grouped_topk

    idx = build_index(tiny_docs_df, stem=False, use_arrow=False).cache()
    attrs = tiny_docs_df.select(
        "doc_id", (F.col("doc_id") % 3).cast("string").alias("source")
    )
    qt = qterms_df(spark, {1: "lazy dog", 2: "fox"}, stem=False)
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    rows = grouped_topk(scored, attrs, "source", n_groups=2,
                        per_group=2).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], {}).setdefault(
            (r["group_rank"], r["group"]), []
        ).append(r)
    for qid, groups in by_q.items():
        assert len(groups) <= 2
        assert sorted(g for g, _ in groups) == list(
            range(1, len(groups) + 1)
        )
        bests = []
        for (grank, _g), members in sorted(groups.items()):
            assert len(members) <= 2
            assert sorted(m["inner_rank"] for m in members) == list(
                range(1, len(members) + 1)
            )
            bests.append(max(m["score"] for m in members))
        assert bests == sorted(bests, reverse=True)
