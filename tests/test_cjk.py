"""CJK bigram analyzer (textproc.cjk_term_counts / cjk_tokenize_py).

Hand-pinned Lucene-CJKAnalyzer-style expectations: CJK runs become
overlapping character bigrams, lone CJK chars emit unigrams, Latin text
takes the reference pipeline (lower, non-alnum → space, stopwords),
mixed-script tokens split at the script boundary.
"""

from themis_search_engine_spark.textproc import (
    cjk_term_counts,
    cjk_tokenize_py,
)


def test_cjk_bigrams_hand_pinned():
    assert cjk_tokenize_py("东京大学") == ["东京", "京大", "大学"]
    assert cjk_tokenize_py("一") == ["一"]
    # mixed-script token splits at the boundary; 'in' is a stopword
    assert cjk_tokenize_py("mixed漢字in") == ["mixed", "漢字"]
    # kana and Han bigram across the script boundary inside one run
    assert cjk_tokenize_py("性能を測定") == ["性能", "能を", "を測", "測定"]
    # fullwidth punctuation (，。) is outside the class → run separator
    assert cjk_tokenize_py("你好，世界。") == ["你好", "世界"]
    # Hangul syllables bigram too
    assert cjk_tokenize_py("한국어") == ["한국", "국어"]
    # pure-ASCII stopword sentence → nothing
    assert cjk_tokenize_py("the and of") == []
    # ASCII casing + digits behave like the reference pipeline
    assert cjk_tokenize_py("Spark 123") == ["spark", "123"]


def test_cjk_column_matches_python_twin(spark):
    texts = [
        (0, "Apache Spark 东京大学 shuffle join"),
        (1, "検索エンジンの性能を測定する"),
        (2, "mixed漢字in the middle"),
        (3, "一"),
        (4, ""),
        (5, "你好，世界。全文検索 full-text 인덱스 123"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["cnt"]
        for r in cjk_term_counts(df).collect()
    }
    want: dict[tuple[int, str], int] = {}
    for doc_id, text in texts:
        for t in cjk_tokenize_py(text):
            want[(doc_id, t)] = want.get((doc_id, t), 0) + 1
    assert got == want
