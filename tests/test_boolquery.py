"""Boolean query language: parser, predicate compilation, retrieval."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng.boolquery import (
    And,
    Not,
    Or,
    Term,
    boolean_score_all,
    parse_boolean,
    predicate_sql,
    query_terms,
)

DOCS = [
    (1, "apple banana cherry"),
    (2, "apple banana"),
    (3, "apple cherry"),
    (4, "banana cherry"),
    (5, "apple"),
    (6, "date fig grape"),
]


def test_parser_precedence_and_parens():
    # OR binds loosest; adjacency is implicit AND; NOT tightest
    assert parse_boolean("a b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))
    assert parse_boolean("a AND (b OR c)") == And(
        (Term("a"), Or((Term("b"), Term("c"))))
    )
    assert parse_boolean("NOT a AND b") == And((Not(Term("a")), Term("b")))
    assert parse_boolean("Apple") == Term("apple")  # P2 lowercase


def test_parser_errors():
    for bad in ("", "a AND", "(a OR b", "a )", "AND a", "a OR OR b"):
        with pytest.raises(ValueError):
            parse_boolean(bad)


def test_query_terms_and_sql():
    ast = parse_boolean("a AND (b OR NOT c)")
    assert query_terms(ast) == (["a", "b"], ["a", "b", "c"])
    assert predicate_sql(ast) == "(f_a AND (f_b OR (NOT f_c)))"


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(docs, stem=False).cache()


def _match_sets(spark, idx, queries):
    out = boolean_score_all(
        spark, queries, idx.postings_flat, idx.dictionary,
        idx.doc_stats, idx.avgdl,
    ).collect()
    res: dict = {q: set() for q in queries}
    for r in out:
        res[r.qid].add(r.doc_id)
    return res, out


def test_boolean_membership(spark, idx):
    res, _ = _match_sets(
        spark,
        idx,
        {
            1: "apple AND banana",
            2: "apple OR banana",
            3: "apple AND NOT banana",
            4: "(apple OR banana) AND cherry",
            5: "apple banana cherry",  # implicit AND
        },
    )
    assert res[1] == {1, 2}
    assert res[2] == {1, 2, 3, 4, 5}
    assert res[3] == {3, 5}
    assert res[4] == {1, 3, 4}
    assert res[5] == {1}


def test_negated_terms_never_score(spark, idx):
    """'apple AND NOT date' and 'apple' give identical scores on the
    docs both match — the prohibited clause contributes nothing."""
    res, rows = _match_sets(spark, idx, {1: "apple AND NOT date", 2: "apple"})
    s1 = {r.doc_id: r.score for r in rows if r.qid == 1}
    s2 = {r.doc_id: r.score for r in rows if r.qid == 2}
    assert set(s1) == set(s2)  # 'date' docs contain no 'apple'
    for d, s in s1.items():
        assert s == pytest.approx(s2[d], rel=1e-12)


def test_pure_negative_rejected(spark, idx):
    with pytest.raises(ValueError, match="pure-negative"):
        boolean_score_all(
            spark, {1: "NOT apple"}, idx.postings_flat, idx.dictionary,
            idx.doc_stats, idx.avgdl,
        )
