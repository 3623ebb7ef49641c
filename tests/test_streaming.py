"""Structured Streaming ingest: micro-batches → checkpoint batches →
finalize ≡ one-shot batch build; windowed event-time metrics."""

import pytest

from themis_search_engine_spark.corpus import load_documents
from themis_search_engine_spark.indexing import build_index
from themis_search_engine_spark.streaming import (
    finalize_stream,
    ingest_pages_stream,
    windowed_ingest_rate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_ingest_equals_batch_build(spark, tmp_path):
    docs = load_documents(spark, SF_DIR).select("doc_id", "text")
    # land the corpus as several files → several micro-batches
    in_dir = str(tmp_path / "landing")
    docs.repartition(3).write.parquet(in_dir)

    out = str(tmp_path / "stream_ckpt")
    q = ingest_pages_stream(
        spark, in_dir, out, stem=False, max_files_per_trigger=1,
        available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive

    from themis_search_engine_spark.indexing.checkpoint import snapshot_status

    st = snapshot_status(out)
    assert len(st["committed_batches"]) >= 2  # maxFilesPerTrigger=1, 3 files
    assert st["pending_batches"] == []

    idx_s = finalize_stream(spark, out)
    idx_b = build_index(docs, stem=False, use_arrow=True)
    a = sorted(
        (r["term"], r["doc_id"], round(r["tf"], 9))
        for r in idx_s.postings_flat.collect()
    )
    b = sorted(
        (r["term"], r["doc_id"], round(r["tf"], 9))
        for r in idx_b.postings_flat.collect()
    )
    assert a == b
    assert idx_s.n_docs == idx_b.n_docs
    assert idx_s.avgdl == pytest.approx(idx_b.avgdl)


def test_stream_serving_index_equals_batch_build(spark, tmp_path):
    """Continuous serving maintenance: micro-batches streamed through
    serve_pages_stream (bootstrap build + delta merges) must yield a
    LIVE index indistinguishable from one batch serving build — stats,
    dictionary and WAND ranks — with stream batch ids stamped in the
    merge log for replay idempotence."""
    import json

    from themis_search_engine_spark.indexing import (
        build_and_save_serving,
        load_serving_index,
        serving_bound_scales,
    )
    from themis_search_engine_spark.queryeng import qterms_df
    from themis_search_engine_spark.queryeng.wand import wand_topk
    from themis_search_engine_spark.streaming import serve_pages_stream

    docs = load_documents(spark, SF_DIR).select("doc_id", "text")
    in_dir = str(tmp_path / "landing")
    docs.repartition(3).write.parquet(in_dir)

    live = str(tmp_path / "live_idx")
    q = serve_pages_stream(
        spark, in_dir, live, stem=False, partitions=8,
        max_files_per_trigger=1, available_now=True,
    )
    q.awaitTermination(180)
    assert not q.isActive

    log = json.load(open(f"{live}/merge_log.json"))
    assert log[0]["type"] == "stream_bootstrap"
    marked = [e["stream_batch_id"] for e in log if "stream_batch_id" in e]
    assert len(marked) == len(set(marked)) >= 3  # every batch stamped once

    idx_s = load_serving_index(spark, live)
    ref = str(tmp_path / "ref_idx")
    idx_b = build_and_save_serving(docs, ref, stem=False, partitions=8)
    assert idx_s.n_docs == idx_b.n_docs
    assert idx_s.avgdl == idx_b.avgdl  # exact long-total_len arithmetic
    assert idx_s.max_doc_id == idx_b.max_doc_id
    assert sorted(
        (r["term"], r["df"]) for r in idx_s.dictionary.collect()
    ) == sorted((r["term"], r["df"]) for r in idx_b.dictionary.collect())

    qt = qterms_df(spark, {1: "spark shuffle join", 2: "window group"},
                   stem=False)
    got = sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in wand_topk(
            qt, idx_s.compressed, idx_s.dictionary, idx_s.avgdl, k=10,
            chunk_bits=idx_s.chunk_bits,
            bound_scales=serving_bound_scales(spark, live),
        ).collect()
    )
    want = sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in wand_topk(
            qt, idx_b.compressed, idx_b.dictionary, idx_b.avgdl, k=10,
            chunk_bits=idx_b.chunk_bits,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_windowed_ingest_rate(spark, tmp_path):
    from themis_search_engine_spark.corpus import synth_pages

    in_dir = str(tmp_path / "pages")
    synth_pages(spark, 300, partitions=2).write.parquet(in_dir)

    from themis_search_engine_spark.corpus import PAGES_SCHEMA

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    rates = windowed_ingest_rate(stream, window="1 minute")
    # update mode + memory sink: append mode would hold windows open until
    # the watermark passes them, and an availableNow drain ends before that
    q = (
        rates.writeStream.outputMode("update")
        .format("memory")
        .queryName("ingest_rates")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, max(n_docs) AS n_docs FROM ingest_rates "
        "GROUP BY window_start"
    )
    # synth warc_ts = epoch + i seconds → 300 docs span 5 one-minute windows
    assert got.count() == 5
    assert got.agg({"n_docs": "sum"}).collect()[0][0] == 300
