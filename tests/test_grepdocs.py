"""Doc-grain substring search: boundary-spanning match, verify split."""

from __future__ import annotations

import pytest

from themis_search_engine_spark.queryeng.grepdocs import (
    doc_trigrams,
    grep_docs,
    normalize_pattern,
)

DOCS = [
    (1, "The quick-brown FOX jumps"),     # 'quick brown fox' after P2
    (2, "quick fox, brown dog"),          # words present, phrase absent
    (3, "a QUICK  Brown   fox!"),         # whitespace/case collapse
    (4, "nothing relevant here"),
    # contains all trigrams of 'abc xyz' (via 'abc' + 'c x' + ' xy'
    # neighborhoods) but not the substring — verify must kill it
    (5, "abc qxy xyz"),
]


def test_normalize_pattern():
    assert normalize_pattern("Big, DATA!") == "big data"
    assert normalize_pattern("  a--b  ") == "a b"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_grep_spans_token_boundaries(spark, docs):
    out = grep_docs(spark, docs, {1: "quick brown fox", 2: "Brown DOG"})
    got: dict = {}
    for r in out.collect():
        got.setdefault(r.qid, set()).add(r.doc_id)
    assert got[1] == {1, 3}   # phrase as substring, punctuation folded
    assert got[2] == {2}


def test_grep_verify_kills_trigram_false_positives(spark, docs):
    out = {r.doc_id for r in grep_docs(spark, docs, {1: "abc xyz"}).collect()}
    assert out == set()  # doc 5 has the grams, not the substring


def test_doc_trigrams_distinct_and_normalized(spark):
    df = spark.createDataFrame([(7, "AbA aba")], "doc_id long, text string")
    grams = sorted(r.gram for r in doc_trigrams(df).collect())
    # normalized text 'aba aba' -> distinct grams only
    assert grams == ["a a", "aba", "ba ", "ba a"] or len(grams) == len(set(grams))
    assert all(g == g.lower() for g in grams)


def test_grep_rejects_short_pattern(spark, docs):
    with pytest.raises(ValueError):
        grep_docs(spark, docs, {1: "ab"})
    with pytest.raises(ValueError):
        grep_docs(spark, docs, {})


def test_grep_snippets_window(spark):
    from themis_search_engine_spark.queryeng.grepdocs import grep_snippets

    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc TARGET ddd eee"),
         (2, "TARGET at the very start"),
         (3, "nothing relevant here")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in grep_snippets(
            spark, docs, {1: "target"}, before=4, length=10
        ).collect()
    }
    assert set(out) == {1, 2}
    # doc 1: normalized 'aaa bbb ccc target ddd eee', match at 13
    assert out[1].mpos == 13
    assert out[1].snippet == "ccc target"
    # doc 2: match at 1 -> window clamps to the string start
    assert out[2].mpos == 1
    assert out[2].snippet == "target at "
