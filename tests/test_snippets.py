"""Doc fetch + KWIC snippets (queryeng/snippets.py).

Pins: window arithmetic on known strings, earliest-term-wins, char (not
byte) positions for multi-byte text, token-boundary matching (no
substring-inside-word hits), and the IN-pushed doc fetch plan.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.snippets import fetch_docs, kwic_snippets

DOCS = [
    (0, "aaaa bbbb cccc spark dddd eeee ffff gggg hhhh iiii jjjj kkkk llll"),
    (1, "中文字符前缀在此 spark 之后还有更多中文字符跟随其后延伸延伸"),
    (2, "sparking sparked sparkle spark done"),  # boundary: only token hit
    (3, "join spark"),  # spark near end; join is the earlier term
]


@pytest.fixture(scope="module")
def sdocs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def sidx(sdocs):
    return build_index(sdocs).cache()


def _snips(spark, sdocs, qs, before=10, length=20):
    qt = qterms_df(spark, qs)
    hits = spark.createDataFrame(
        [(qid, d, i + 1) for qid in qs for i, (d, _t) in enumerate(DOCS)],
        "qid long, doc_id long, rank long",
    )
    out = kwic_snippets(hits, sdocs, qt, before=before, length=length)
    return {r["doc_id"]: r["snippet"] for r in out.collect()}


def test_window_and_boundaries(spark, sdocs):
    got = _snips(spark, sdocs, {1: "spark"})
    # doc 0: 'spark' starts at char 16 (1-based); window starts at 6
    assert got[0] == DOCS[0][1][5 : 5 + 20]
    assert "spark" in got[0]
    # doc 2: token-boundary — first TOKEN 'spark' is at position 26, not
    # inside 'sparking' (pos 1); window start = 26 - 10 = 16
    assert got[2] == DOCS[2][1][15 : 15 + 20]
    assert got[2].startswith("d sparkle spark done")


def test_multibyte_char_positions(spark, sdocs):
    got = _snips(spark, sdocs, {1: "spark"})
    # CJK prefix is 8 chars + space → 'spark' at char position 10;
    # char-based window (10-10 → clamp 1) takes the string head
    assert got[1] == DOCS[1][1][:20]
    assert "spark" in got[1]


def test_earliest_term_wins(spark, sdocs):
    got = _snips(spark, sdocs, {1: "spark join"})
    # doc 3: 'join' (pos 1) precedes 'spark' (pos 6) → window from head
    assert got[3] == DOCS[3][1][:20]


def test_matches_duckdb_substring_semantics(spark, sdocs):
    """Cross-engine pin on the exact expression pair used by the oracle."""
    con = duckdb.connect()
    for doc_id, text in DOCS:
        pos, snip = con.sql(
            "SELECT nullif(strpos(' ' || lower(regexp_replace($t, "
            "'[^a-zA-Z0-9]', ' ', 'g')) || ' ', ' spark '), 0), "
            "substring($t, greatest(1, nullif(strpos(' ' || "
            "lower(regexp_replace($t, '[^a-zA-Z0-9]', ' ', 'g')) || ' ', "
            "' spark '), 0) - 10), 20)",
            params={"t": text},
        ).fetchone()
        got = _snips(spark, sdocs, {1: "spark"})
        assert got[doc_id] == snip, (doc_id, got[doc_id], snip, pos)


def test_fetch_docs_in_pushdown(spark, tmp_path, sdocs):
    path = str(tmp_path / "docs")
    sdocs.write.parquet(path)
    docs = spark.read.parquet(path)
    hits = spark.createDataFrame(
        [(1, 0, 1), (1, 2, 2)], "qid long, doc_id long, rank long"
    )
    plan = fetch_docs(hits, docs)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "In(doc_id, [0,2])" in plan


def test_correct_qterms_rewrite_rules(spark):
    """known term passes through; unknown term rewrites to rank-1
    correction; uncorrectable term stays verbatim."""
    from themis_search_engine_spark.queryeng.spell import correct_qterms

    dictionary = spark.createDataFrame(
        [("spark", 10, 0.1), ("shuffle", 5, 0.2), ("sharle", 1, 0.3)],
        "term string, df long, idf double",
    )
    qt = spark.createDataFrame(
        [(1, "spark"), (1, "shufle"), (2, "zzzzzz")],
        "qid int, term string",
    )
    got = {(r.qid, r.term) for r in correct_qterms(qt, dictionary).collect()}
    # shufle → shuffle (df 5 beats sharle df 1); spark stays; zzzzzz stays
    assert got == {(1, "spark"), (1, "shuffle"), (2, "zzzzzz")}
