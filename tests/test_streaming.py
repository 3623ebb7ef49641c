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
