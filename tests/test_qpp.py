"""Pre-retrieval QPP predictors (queryeng/qpp.py): semantic sanity on the
tiny corpus — the driver's DuckDB oracle pins the exact values; these pin
the MEANING (rare-term queries predict easier than head-term queries)."""

import math

import pytest

from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.qpp import query_difficulty

QUERIES = {
    1: "sparking",            # rare single term (df=1 in the tiny corpus)
    2: "lazy dog fox",        # common terms (df=2 each), flat profile
    3: "the and of",          # all stopwords → no in-vocab terms → no row
    4: "zzzunknown sparking",  # OOV term drops, sparking stays
}


@pytest.fixture(scope="module")
def idx(tiny_docs_df):
    return build_index(tiny_docs_df, stem=False, use_arrow=False).cache()


@pytest.fixture(scope="module")
def pred(spark, idx):
    qt = qterms_df(spark, QUERIES, stem=False)
    rows = query_difficulty(qt, idx.dictionary, idx.counts).collect()
    return {r["qid"]: r for r in rows}


def test_row_contract(pred):
    assert set(pred) == {1, 2, 4}  # all-stopword query yields no row
    assert pred[1]["n_terms"] == 1
    assert pred[2]["n_terms"] == 3
    assert pred[4]["n_terms"] == 1  # OOV term dropped, not counted


def test_single_term_profile(pred):
    # one term: avg == max, zero variance
    assert pred[1]["avg_idf"] == pred[1]["max_idf"]
    assert pred[1]["var_idf"] == pytest.approx(0.0)
    # qid 4 keeps only "sparking" → identical predictors to qid 1
    for c in ("avg_idf", "max_idf", "var_idf", "avg_ictf", "scq"):
        assert pred[4][c] == pred[1][c]


def test_rare_beats_common(pred, idx):
    # "sparking" (df=1) is rarer than any of {lazy,dog,fox} (df=2), so
    # the single-rare-term query must show the higher max_idf and higher
    # avg_ictf (the easier-query signal).
    assert pred[1]["max_idf"] >= pred[2]["max_idf"]
    assert pred[1]["avg_ictf"] > pred[2]["avg_ictf"]


def test_total_tokens_scalar_matches_gstats(spark, idx):
    # |C| given via global stats (n_docs·avgdl) must equal the computed
    # Σ cnt — callers can skip the extra aggregate.
    qt = qterms_df(spark, QUERIES, stem=False)
    a = query_difficulty(qt, idx.dictionary, idx.counts).collect()
    b = query_difficulty(
        qt, idx.dictionary, idx.counts,
        total_tokens=idx.n_docs * idx.avgdl,
    ).collect()
    key = lambda r: r["qid"]  # noqa: E731
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        for c in a[0].asDict():
            va, vb = ra[c], rb[c]
            if isinstance(va, float):
                assert math.isclose(va, vb, rel_tol=0, abs_tol=0)
            else:
                assert va == vb


def test_route_by_difficulty(spark, idx):
    from themis_search_engine_spark.queryeng.qpp import route_by_difficulty

    qt = qterms_df(spark, QUERIES, stem=False)
    pred = query_difficulty(qt, idx.dictionary, idx.counts)
    # median split: both routes non-empty on a mixed batch, disjoint,
    # and together exactly the predicted qids
    easy, hard = route_by_difficulty(pred)
    assert easy and hard
    assert not (set(easy) & set(hard))
    assert set(easy) | set(hard) == {1, 2, 4}
    # explicit threshold: everything above it is easy
    easy_all, hard_all = route_by_difficulty(
        pred, max_idf_threshold=-1e9
    )
    assert set(easy_all) == {1, 2, 4} and hard_all == []
    # empty predictor frame → no routes
    assert route_by_difficulty(pred.where("qid = 999")) == ([], [])


# --- significant terms (result-set analytics, queryeng/mlt.py) --------------

def test_significant_terms_semantics(spark, idx):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from themis_search_engine_spark.queryeng.bm25 import bm25_score_all
    from themis_search_engine_spark.queryeng.mlt import significant_terms

    qt = qterms_df(spark, {1: "lazy dog"}, stem=False)
    scored = bm25_score_all(
        qt, idx.postings_flat, idx.dictionary, idx.doc_stats, idx.avgdl
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    fg = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where("rank <= 3")
        .select("qid", "doc_id", "score", "rank")
    )
    out = significant_terms(
        fg, idx.counts, idx.dictionary, idx.n_docs, top_terms=5, min_fg=2
    ).collect()
    assert out
    terms = [r["term"] for r in sorted(out, key=lambda r: r["rank"])]
    # the query's own vocabulary is concentrated in its result set — it
    # must surface among the significant terms
    assert {"lazy", "dog"} & set(terms)
    # min_fg: every surfaced term occurs in >= 2 foreground docs
    fg_ids = {r["doc_id"] for r in fg.collect()}
    cnt = {}
    for r in idx.counts.collect():
        if r["doc_id"] in fg_ids:
            cnt[r["term"]] = cnt.get(r["term"], 0) + 1
    assert all(cnt[t] >= 2 for t in terms)
    # ranks are 1..n dense and ordered by score desc
    byrank = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in byrank] == list(range(1, len(out) + 1))
    assert all(
        byrank[i]["score"] >= byrank[i + 1]["score"]
        for i in range(len(byrank) - 1)
    )
