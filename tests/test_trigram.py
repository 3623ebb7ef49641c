"""Trigram infix retrieval: gram generation, expansion, plan shape."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.queryeng.trigram import (
    infix_qterms,
    pattern_grams,
    trigram_terms,
)


def test_pattern_grams():
    assert pattern_grams("uer") == ["uer"]
    assert pattern_grams("abcd") == ["abc", "bcd"]
    # repeated trigram deduped
    assert pattern_grams("aaaa") == ["aaa"]
    with pytest.raises(ValueError):
        pattern_grams("ab")


def test_trigram_terms(spark):
    d = spark.createDataFrame(
        [("scan", 4), ("ab", 9)], "term string, df long"
    )
    rows = {(r.gram, r.term, r.df) for r in trigram_terms(d).collect()}
    # length-2 terms emit nothing; 'scan' -> sca, can
    assert rows == {("sca", "scan", 4), ("can", "scan", 4)}


@pytest.fixture()
def tiny_dict(spark):
    return spark.createDataFrame(
        [
            ("partition", 50),
            ("part", 40),
            ("artist", 30),
            ("cart", 20),
            ("xyz", 10),
            # contains both grams of 'abcd' (abc, bcd) but NOT the
            # pattern itself — must survive candidate generation and
            # die in the contains verify
            ("abcxbcd", 60),
            ("zabcdz", 5),
        ],
        "term string, df long",
    )


def test_infix_qterms_expansion(spark, tiny_dict):
    out = infix_qterms(
        spark, tiny_dict, {1: "art", 2: "tit", 3: "abcd"}, max_terms=3
    ).collect()
    got = {(r.qid, r.term) for r in out}
    # q1 'art': partition/part/artist/cart all contain it; top-3 by df
    # q2 'tit': only partition; q3 'abcd': verify kills abcxbcd
    assert got == {
        (1, "partition"),
        (1, "part"),
        (1, "artist"),
        (2, "partition"),
        (3, "zabcdz"),
    }
    assert all(r.qweight == 1.0 for r in out)


def test_infix_verify_is_candidate_bounded(spark, tiny_dict):
    """The 100 TB shape: candidate generation is a gram equi-join (the
    pattern's trigrams IN-pushed into the gram→term artifact), and the
    only substring predicate in the whole plan is the single
    contains-verify on candidates — never an unanchored LIKE over the
    dictionary."""
    plan = (
        infix_qterms(spark, tiny_dict, {1: "abcd"})
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LIKE" not in plan.upper().replace("UNLIKE", "")
    assert plan.count("Contains") == 1
    assert "gram#" in plan  # the equi-join key exists in the plan
