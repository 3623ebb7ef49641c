"""Percolation: batch semantics + streaming twin equivalence."""

from __future__ import annotations

from themis_search_engine_spark.queryeng import qterms_df
from themis_search_engine_spark.queryeng.percolate import percolate
from themis_search_engine_spark.streaming.percolate import percolate_stream
from themis_search_engine_spark.textproc import tokens_native

QUERIES = {
    1: "lazy dog",          # both terms in docs 0 and 2
    2: "fox",               # docs 0 and 5
    3: "quick fox engine",  # no doc has all three
    4: "the a of",          # all stopwords -> zero terms, matches nothing
    5: "zzzunknown fox",    # unknown term -> AND never matches
}


def _expected_all():
    return {(0, 1), (2, 1), (0, 2), (5, 2)}


def test_percolate_all_mode(spark, tiny_docs_df):
    qt = qterms_df(spark, QUERIES, stem=False)
    got = {
        (r["doc_id"], r["qid"])
        for r in percolate(tokens_native(tiny_docs_df), qt, mode="all").collect()
    }
    assert got == _expected_all()


def test_percolate_any_and_min_match(spark, tiny_docs_df):
    qt = qterms_df(spark, QUERIES, stem=False)
    toks = tokens_native(tiny_docs_df)
    any_rows = percolate(toks, qt, mode="any").collect()
    # "quick fox engine" matches docs with >=1 of the three under any
    assert any(r["qid"] == 3 for r in any_rows)
    # every all-mode match is an any-mode match
    all_pairs = _expected_all()
    any_pairs = {(r["doc_id"], r["qid"]) for r in any_rows}
    assert all_pairs <= any_pairs
    # min_match=2 on qid 3: docs holding >=2 of {quick, fox, engine}
    mm = {
        (r["doc_id"], r["qid"])
        for r in percolate(toks, qt, min_match=2).collect()
        if r["qid"] == 3
    }
    assert mm == {(0, 3)}  # "quick ... fox" in doc 0


def test_percolate_stream_equals_batch(spark, tiny_docs_df, tmp_path):
    """The per-row array-arithmetic streaming plan must emit exactly the
    batch operator's rows, across multiple micro-batches."""
    qt = qterms_df(spark, QUERIES, stem=False)
    in_dir = str(tmp_path / "in")
    tiny_docs_df.repartition(3).write.parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        percolate_stream(stream, qt, mode="all")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("perc_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["qid"], r["n_matched"])
        for r in spark.sql("SELECT * FROM perc_out").collect()
    }
    want = {
        (r["doc_id"], r["qid"], r["n_matched"])
        for r in percolate(tokens_native(tiny_docs_df), qt, mode="all").collect()
    }
    assert got == want
