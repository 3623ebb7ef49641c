"""Incremental index ingestion via Structured Streaming.

The reference has no streaming surface (SURVEY.md §2.9); this is the
Spark-native extension for a corpus that keeps growing (Common Crawl
snapshots landing as files/Iceberg appends):

  readStream(pages) → foreachBatch: tokenize (Arrow path) and commit the
  micro-batch as one checkpoint batch in EXACTLY the layout
  indexing.checkpoint uses (counts/docs parquet + atomic manifest.json)
  → checkpoint.finalize() merges committed batches into the four index
  tables whenever a fresh snapshot is wanted.

Exactly-once: Structured Streaming's own checkpoint (WAL + offsets)
replays a failed batch with the same batch_id; the writer below is
idempotent per batch_id (overwrite + atomic manifest rename), so replays
converge. Max-TF tf stays correct because a doc lives entirely inside one
micro-batch (file-source batches split on file boundaries, and a doc is
one row) — the same doc-boundary invariant the batch build relies on.

:func:`windowed_ingest_rate` adds the event-time lane: per-window doc
counts with a watermark for late data — the streaming metrics feed
(docs/sec over warc_ts windows).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..corpus import PAGES_SCHEMA
from ..indexing.checkpoint import _FMT_VERSION, _batch_dir, _write_manifest
from ..textproc import term_counts_arrow


def _commit_stream_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    *,
    key_col: str,
    text_col: str,
    stem: bool,
) -> None:
    t0 = time.perf_counter()
    counts = term_counts_arrow(batch_df, text_col, key_col, stem=stem)
    cdir = f"{_batch_dir(out_path, batch_id)}/counts"
    counts.write.mode("overwrite").parquet(cdir)
    sdir = f"{_batch_dir(out_path, batch_id)}/docs"
    batch_df.select(F.col(key_col).alias("doc_id")).write.mode(
        "overwrite"
    ).parquet(sdir)

    spark = batch_df.sparkSession
    n_postings = spark.read.parquet(cdir).count()
    n_docs = spark.read.parquet(sdir).count()
    wall = time.perf_counter() - t0
    _write_manifest(
        out_path,
        batch_id,
        {
            "format_version": _FMT_VERSION,
            "batch": batch_id,
            "n_batches": None,  # open-ended stream
            "input_fingerprint": f"stream:{text_col}:{stem}",
            "slice_predicate": f"stream micro-batch {batch_id}",
            "n_docs": int(n_docs),
            "n_postings": int(n_postings),
            "bytes_written": 0,
            "wall_seconds": round(wall, 4),
            "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
            "postings_per_sec": (
                round(n_postings / wall, 2) if wall > 0 else None
            ),
            "committed": True,
        },
    )


def ingest_pages_stream(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = True,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the ingestion stream over a parquet directory of pages
    (doc_id assigned upstream, e.g. abs(xxhash64(url))).

    ``available_now=True`` drains everything currently in the directory
    and stops (the batch-backfill trigger); False keeps listening.
    """
    pages = _pages_reader(
        spark, input_dir, key_col, text_col, max_files_per_trigger
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _commit_stream_batch(
            batch_df, batch_id, out_path,
            key_col=key_col, text_col=text_col, stem=stem,
        )

    return _start_foreach_batch(
        pages, sink, f"{out_path}/_stream_checkpoint", available_now
    )


def finalize_stream(spark: SparkSession, out_path: str):
    """Merge every committed micro-batch into the four index tables —
    identical to resuming a batch checkpoint build."""
    from ..indexing.checkpoint import finalize

    return finalize(spark, out_path)


def windowed_ingest_rate(
    pages_stream: DataFrame,
    *,
    ts_col: str = "warc_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time ingestion metrics: docs per ``window`` of crawl time,
    tolerating ``watermark`` of late-arriving pages. Append-mode safe
    (the watermark closes windows); feeds a metrics sink at scale."""
    return (
        pages_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
        )
    )


def _pages_reader(
    spark: SparkSession,
    input_dir: str,
    key_col: str,
    text_col: str,
    max_files_per_trigger: int,
) -> DataFrame:
    """Shared landing-directory reader for both streaming entry points."""
    return (
        spark.readStream.schema(
            # file source needs an explicit schema; accept either raw pages
            # or pre-keyed (doc_id, text) layouts
            PAGES_SCHEMA if key_col == "url"
            else f"{key_col} long, {text_col} string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def _start_foreach_batch(pages, sink, checkpoint: str, available_now: bool):
    writer = (
        pages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def serve_pages_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = True,
    partitions: int = 16,
    chunk_bits: int | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous SERVING-index maintenance: each micro-batch of new pages
    becomes one delta segment of the LIVE queryable index — readStream →
    foreachBatch(merge_serving_delta). The first batch bootstraps the
    index with a full serving build (an index already at ``index_path``
    is ADOPTED as the base instead); every later batch is an O(delta)
    merge (indexing/merge.py: base posting files never re-read), so the
    index stays continuously queryable by every serving plan (bridge /
    sharded / in-process) while the crawl streams in; schedule
    compact_serving_index when describe_index shows fragmentation worth
    reclaiming.

    Exactly-once state machine, all transitions through ATOMIC merge-log
    appends (a replayed foreachBatch reruns under the same batch_id):

    - bootstrap: a ``stream_bootstrap_pending`` marker is logged BEFORE
      the build; the build itself is a full-overwrite (idempotent), and
      a ``stream_bootstrap`` completion marker commits it — a crash at
      any point replays into a clean rebuild, never into a merge against
      a half-built index.
    - merge: the (run, batch_id) marker rides IN the merge's own log
      entry (one atomic append), so "merged" and "marked" cannot be
      observed separately; a replay whose marker is already logged is
      skipped.
    - markers are scoped to a per-checkpoint run id: batch_ids restart
      at 0 when a stream checkpoint is lost/reset, and an unscoped
      marker would then silently skip NEW data. With a lost checkpoint
      the file source also re-delivers old files — that replay surfaces
      as the merge's duplicate-doc_id error (loud), not silent double
      indexing.

    ``key_col`` must be a numeric id: the serving layout addresses
    postings by chunk = doc_id >> chunk_bits, so raw urls are rejected —
    assign ids upstream (corpus.assign_doc_ids for batch backfills, or
    any dense assigner in the landing pipeline).
    """
    if key_col == "url":
        raise ValueError(
            "serve_pages_stream requires a numeric id column: the serving "
            "layout addresses postings by chunk = doc_id >> chunk_bits. "
            "Assign doc_ids in the landing pipeline (e.g. "
            "corpus.assign_doc_ids) and pass key_col='doc_id'."
        )

    from ..indexing.build import build_and_save_serving
    from ..indexing.merge import _append_log, _read_log, merge_serving_delta

    pages = _pages_reader(
        spark, input_dir, key_col, text_col, max_files_per_trigger
    )

    # run id tied to the stream CHECKPOINT: same checkpoint (and thus
    # same batch-id sequence) -> same run id across restarts; a new/reset
    # checkpoint gets a fresh run id so stale markers can't match
    ckpt = f"{index_path}/_stream_checkpoint"
    os.makedirs(ckpt, exist_ok=True)
    run_file = f"{ckpt}/themis_run_id"
    if os.path.exists(run_file):
        with open(run_file) as fh:
            run_id = fh.read().strip()
    else:
        import uuid

        run_id = uuid.uuid4().hex
        tmp = f"{run_file}.tmp"
        with open(tmp, "w") as fh:
            fh.write(run_id)
        os.replace(tmp, run_file)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            F.col(key_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        log = _read_log(index_path)
        if any(
            e.get("stream_run") == run_id
            and e.get("stream_batch_id") == batch_id
            for e in log
        ):
            return  # replayed batch already fully processed
        # a pending marker is resolved by ANY later completion in log
        # order — not only one from the same stream_run. A bootstrap that
        # crashes before its completion marker, followed by a checkpoint
        # reset (fresh run id), must not leave an eternally-unmatched
        # pending entry: that would re-enter this branch on EVERY later
        # micro-batch and silently overwrite the index with just that
        # batch's docs (covered by
        # test_streaming.test_crashed_bootstrap_then_checkpoint_reset).
        pending = None
        for e in log:
            if e.get("type") == "stream_bootstrap_pending":
                pending = e
            elif e.get("type") == "stream_bootstrap":
                pending = None
        bootstrapped = any(e.get("type") == "stream_bootstrap" for e in log)
        has_index = os.path.exists(f"{index_path}/global_stats")

        if pending is not None or not (bootstrapped or has_index):
            # fresh index (or a bootstrap that crashed mid-build): full
            # idempotent rebuild of every table, then commit the marker
            if pending is None:
                os.makedirs(index_path, exist_ok=True)
                _append_log(index_path, {
                    "type": "stream_bootstrap_pending",
                    "stream_run": run_id,
                    "pending_batch_id": batch_id,
                })
            build_and_save_serving(
                docs, index_path, stem=stem, partitions=partitions,
                chunk_bits=chunk_bits,
            )
            _append_log(index_path, {
                "type": "stream_bootstrap",
                "stream_run": run_id,
                "stream_batch_id": batch_id,
            })
            return
        # pre-existing index with no stream history: adopt it as the base
        # (no marker needed — the merge below stamps this batch)
        merge_serving_delta(
            spark, index_path, docs, stem=stem, partitions=partitions,
            log_extra={"stream_run": run_id, "stream_batch_id": batch_id},
        )

    return _start_foreach_batch(pages, sink, ckpt, available_now)
