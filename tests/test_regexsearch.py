"""Regex retrieval: parser, trigram planning soundness, lane equivalence."""

from __future__ import annotations

import re

import pytest

from themis_search_engine_spark.queryeng.regexsearch import (
    parse_regex,
    plan_regex,
    regex_qterms,
)


def test_parser_rejects_unsupported():
    for bad in ["a(b", "a)b", "[^ab]", "a{2,3}", "[ab", "a[z-a]"]:
        with pytest.raises(ValueError):
            parse_regex(bad)


def test_plan_matrix():
    kind = lambda p: plan_regex(p)[0]  # noqa: E731
    # small finite language -> exact IN-list, no gram index touched
    assert plan_regex("(sc|pl)an") == ("exact", ["plan", "scan"])
    assert plan_regex("filters?") == ("exact", ["filter", "filters"])
    assert kind("x[0-9]y") == "exact"
    # infinite language with required trigrams -> gram lane
    assert kind(".*tab.*") == "grams"
    assert kind("colum.") == "grams"
    assert kind("(ab|cd)efg+") == "grams"
    # nothing constrainable -> honest scan lane
    assert kind("s.an") == "scan"
    assert kind("a|.*") == "scan"


# a vocabulary with matches, near-misses, boundary-spanning cases and
# short terms the gram index cannot carry
_VOCAB = [
    "query", "queries", "queryx", "quer",
    "scan", "plan", "span", "sean",
    "column", "columns", "colum",
    "table", "tab", "stab", "tbl",
    "filter", "filters", "filtered",
    "abefg", "cdefg", "abefgg", "axefg",
    "ab", "a", "xy", "x0y", "x5y", "xay",
    "groop", "group", "grp",
]

_PATTERNS = [
    "quer(y|ies)",
    "s.an",
    "(sc|pl)an",
    "colum.",
    ".*tab.*",
    "filters?",
    "(ab|cd)efg+",
    "x[0-9]y",
    "a.?",
    "gr(ou|oo)p",
]


def test_candidates_equal_bruteforce(spark):
    """regex_qterms must equal the naive full-vocabulary anchored regex
    scan — the trigram prefilter is lossless (no false negatives) and
    the verify kills every false positive."""
    dictionary = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(_VOCAB)], "term string, df long"
    )
    queries = {i + 1: p for i, p in enumerate(_PATTERNS)}
    got = {
        (r.qid, r.term)
        for r in regex_qterms(
            spark, dictionary, queries, max_terms=100
        ).collect()
    }
    want = {
        (qid, t)
        for qid, p in queries.items()
        for t in _VOCAB
        if re.fullmatch(p, t)
    }
    assert got == want


def test_cap_is_df_desc_term_asc(spark):
    dictionary = spark.createDataFrame(
        [("tab", 5), ("table", 50), ("stab", 40), ("tabby", 40)],
        "term string, df long",
    )
    out = regex_qterms(spark, dictionary, {1: ".*tab.*"}, max_terms=2).collect()
    assert sorted(r.term for r in out) == ["stab", "table"]


def test_gram_lane_has_no_full_scan(spark):
    """A gram-plan batch must not cross-join the dictionary: candidates
    come from the gram IN-pushdown join (the scan lane is per-query and
    not taken here). Short-term sidecar is a broadcast over the len<3
    slice only, so assert no BroadcastNestedLoopJoin over the full dict
    by checking the slice filter is present."""
    dictionary = spark.createDataFrame(
        [("table", 50), ("tab", 5), ("xy", 1)], "term string, df long"
    )
    df = regex_qterms(spark, dictionary, {1: ".*tab.*"})
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "length(term" in plan  # short-term sidecar is length-sliced


def test_regex_grep_equals_bruteforce(spark):
    """regex_grep must equal an unanchored regex search over the
    normalized corpus — tree candidates are lossless, verify kills FPs,
    and the scan lane covers no-trigram regexes."""
    from themis_search_engine_spark.queryeng.grepdocs import regex_grep

    texts = {
        0: "hash join under a slow query plan",
        1: "hash agg then merge sort and batch scan",
        2: "merge first then a big batch later",
        3: "jawn jon jn",               # 'jo.n' must NOT match any of these
        4: "joins everywhere",           # 'jo.n' unanchored: 'join' + 's'
        5: "hash  JOIN!! punctuated",    # normalization collapses to 'hash join'
        6: "small scan small query",
        7: "xy",                          # shorter than a trigram
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    queries = {1: "hash (join|agg)", 2: "jo.n", 3: "merge .*batch",
               4: "s(low|mall) (query|scan)"}
    got = {
        (r.qid, r.doc_id)
        for r in regex_grep(spark, docs, queries).collect()
    }

    def norm(t):
        return " ".join(
            "".join(c if c.isalnum() else " " for c in t.lower()).split()
        )

    want = {
        (qid, did)
        for qid, p in queries.items()
        for did, t in texts.items()
        if re.search(p, norm(t))
    }
    assert got == want
    # pin the interesting semantics the fixture encodes
    assert (1, 5) in got          # normalization-insensitive
    assert (2, 4) in got          # unanchored interior match
    assert (2, 3) not in got      # 'jo.n' needs exactly one char gap
    assert (3, 1) in got and (3, 2) in got
