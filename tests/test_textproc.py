"""Equality of the three tokenizer implementations + reference semantics."""

from collections import Counter

from themis_search_engine_spark.stopwords import STOPWORDS, is_stopword
from themis_search_engine_spark.textproc import (
    normalize_py,
    term_counts_arrow,
    term_counts_native,
    term_counts_py,
    tokenize_py,
)

from tests.conftest import TINY_DOCS


def test_stopwords_reference_semantics():
    # StopWords.java:117-122 smoke checks
    assert is_stopword("other")
    assert not is_stopword("ending")
    assert len(STOPWORDS) == 412


def test_normalize_ascii_only():
    # P2: non-alnum → space, lowercase; Greek yields no tokens
    assert normalize_py("Hello, World! 42") == "hello  world  42"
    assert tokenize_py("Ελληνικά κείμενο", stem=False) == []


def test_stopword_checked_prestem():
    # 'during' is a stopword (raw); 'ending' stems to 'end' but is NOT a
    # stopword so it survives (quirk §2.8.5)
    assert tokenize_py("during the ending", stem=True) == ["end"]


def test_three_paths_agree_unstemmed(spark, tiny_docs_df):
    native = {
        (r["doc_id"], r["term"]): r["cnt"]
        for r in term_counts_native(tiny_docs_df).collect()
    }
    arrow = {
        (r["doc_id"], r["term"]): r["cnt"]
        for r in term_counts_arrow(tiny_docs_df, stem=False).collect()
    }
    py = {}
    for doc_id, text in TINY_DOCS.items():
        for t, c in term_counts_py(text, stem=False).items():
            py[(doc_id, t)] = float(c)
    assert native == py
    assert arrow == py


def test_arrow_path_agrees_stemmed(spark, tiny_docs_df):
    arrow = {
        (r["doc_id"], r["term"]): r["cnt"]
        for r in term_counts_arrow(tiny_docs_df, stem=True).collect()
    }
    py = {}
    for doc_id, text in TINY_DOCS.items():
        for t, c in term_counts_py(text, stem=True).items():
            py[(doc_id, t)] = float(c)
    assert arrow == py


def test_stem_merges_surface_forms():
    c = term_counts_py("sparking sparks spark sparked", stem=True)
    assert c == {"spark": 4}


def test_counts_match_counter_semantics():
    text = TINY_DOCS[2]
    assert term_counts_py(text, stem=False) == dict(
        Counter(t for t in normalize_py(text).split() if t not in STOPWORDS)
    )
