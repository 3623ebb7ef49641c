"""Resumable, checkpointed index builds with per-batch lineage + metrics.

North-rule requirement (BASELINE.json): "Index builds are resumable from
Iceberg snapshot checkpoints with per-partition lineage and metrics
(docs/sec, postings/sec, bytes compressed)".

Design — Iceberg semantics on a parquet stand-in (this sandbox has no
Iceberg runtime jar; the layout below IS the Iceberg mapping, noted inline):

  out/
    batches/batch=<i>/counts/        enriched counts parquet for corpus slice i
                                     (≡ one Iceberg APPEND snapshot)
    batches/batch=<i>/manifest.json  lineage: input fingerprint, row counts,
                                     bytes, wall seconds, throughputs
                                     (≡ snapshot summary + manifest list)
    snapshot.json                    committed-batch set after finalize
                                     (≡ current-snapshot pointer)
    index/                           final four tables (save_index layout)
    metrics/                         per-batch metrics parquet (lineage table)

The corpus is sliced into ``n_batches`` deterministic slices by
``pmod(xxhash64(url), n_batches)`` — a pure function of the row, so a resumed
run re-derives exactly the same slice membership regardless of partitioning
(the Iceberg analog is replaying the table's file-manifest split). Each batch
is tokenized with the vectorized Arrow pipeline and written with its OWN
atomic manifest; a killed run leaves at most one uncommitted batch directory,
which resume detects (missing/invalid manifest) and rebuilds.

Why the reference shape allows batch-local tf: the stored tf is max-TF
normalized WITHIN a doc (Indexer.java:410-418) and a doc lives in exactly one
batch (slicing is by doc key — same invariant as the reference's "partial
boundaries are doc boundaries", SURVEY.md §2.8.7). Only df/N/avgdl need the
cross-batch merge, which is the finalize aggregation.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textproc import term_counts_arrow
from .build import InvertedIndex, load_index

_FMT_VERSION = 1


def _batch_dir(out_path: str, i: int) -> str:
    return f"{out_path}/batches/batch={i}"


def _manifest_path(out_path: str, i: int) -> str:
    return f"{_batch_dir(out_path, i)}/manifest.json"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def batch_committed(out_path: str, i: int, input_fingerprint: str) -> bool:
    """A batch is committed iff its manifest exists, parses, and matches the
    input fingerprint + format version (the Iceberg analog: the snapshot is
    in the table's committed snapshot log)."""
    try:
        with open(_manifest_path(out_path, i)) as fh:
            m = json.load(fh)
        return (
            m.get("format_version") == _FMT_VERSION
            and m.get("input_fingerprint") == input_fingerprint
            and m.get("committed") is True
        )
    except (OSError, ValueError):
        return False


def _write_manifest(out_path: str, i: int, manifest: dict) -> None:
    """Atomic commit: write sidecar then rename — rename is the commit point
    (≡ Iceberg's atomic snapshot swap on the metadata pointer)."""
    path = _manifest_path(out_path, i)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def corpus_fingerprint(pages: DataFrame, *, text_col: str, stem: bool) -> str:
    """Cheap, deterministic identity of (input schema + build config).

    Row-content hashing at 10^12 docs would cost a full scan per resume; the
    Iceberg analog is the (table uuid, snapshot id) pair, which this layout
    doesn't have — schema + config + column set is the sandbox stand-in.
    """
    sig = {
        "schema": pages.schema.simpleString(),
        "text_col": text_col,
        "stem": stem,
        "format_version": _FMT_VERSION,
    }
    return json.dumps(sig, sort_keys=True)


def build_batch(
    pages: DataFrame,
    out_path: str,
    i: int,
    n_batches: int,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = True,
    input_fingerprint: str = "",
) -> dict:
    """Tokenize + count one corpus slice, persist it, commit its manifest.

    Returns the manifest (lineage record). Skew note: the slice filter is on
    the doc key, so every batch sees the full Zipf term distribution — head-
    term handling stays where it belongs (compress.py range-chunking / salted
    final merge), not in the batching.
    """
    t0 = time.perf_counter()
    slice_df = pages.where(
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_batches)) == i
    )
    counts = term_counts_arrow(slice_df, text_col, key_col, stem=stem)
    cdir = f"{_batch_dir(out_path, i)}/counts"
    counts.write.mode("overwrite").parquet(cdir)

    # doc-level rows (every doc in the slice, even token-less ones) — needed
    # so N/avgdl at finalize match the reference's every-doc-counts semantics
    docs_df = slice_df.select(F.col(key_col).alias("doc_id"))
    sdir = f"{_batch_dir(out_path, i)}/docs"
    docs_df.write.mode("overwrite").parquet(sdir)

    spark = pages.sparkSession
    stats = (
        spark.read.parquet(cdir)
        .agg(
            F.count(F.lit(1)).alias("postings"),
            F.countDistinct("doc_id").alias("docs_with_terms"),
        )
        .collect()[0]
    )
    n_docs = spark.read.parquet(sdir).count()
    wall = time.perf_counter() - t0
    nbytes = _dir_bytes(_batch_dir(out_path, i))
    manifest = {
        "format_version": _FMT_VERSION,
        "batch": i,
        "n_batches": n_batches,
        "input_fingerprint": input_fingerprint,
        "slice_predicate": f"pmod(xxhash64({key_col}), {n_batches}) = {i}",
        "n_docs": int(n_docs),
        "n_postings": int(stats["postings"]),
        "bytes_written": int(nbytes),
        "wall_seconds": round(wall, 4),
        "docs_per_sec": round(n_docs / wall, 2) if wall > 0 else None,
        "postings_per_sec": (
            round(int(stats["postings"]) / wall, 2) if wall > 0 else None
        ),
        "committed": True,
    }
    _write_manifest(out_path, i, manifest)
    return manifest


def build_resumable(
    pages: DataFrame,
    out_path: str,
    *,
    n_batches: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = True,
    max_batches: int | None = None,
) -> list[dict]:
    """Run (or resume) the batched build. Committed batches are skipped —
    calling this again after a kill continues where the last commit left off.

    ``max_batches`` caps how many NEW batches this invocation builds (used by
    the kill/resume test to simulate an interruption). Returns the manifests
    of all committed batches so far, in batch order.
    """
    fp = corpus_fingerprint(pages, text_col=text_col, stem=stem)
    manifests: list[dict] = []
    built = 0
    for i in range(n_batches):
        if batch_committed(out_path, i, fp):
            with open(_manifest_path(out_path, i)) as fh:
                manifests.append(json.load(fh))
            continue
        if max_batches is not None and built >= max_batches:
            continue
        manifests.append(
            build_batch(
                pages, out_path, i, n_batches,
                key_col=key_col, text_col=text_col, stem=stem,
                input_fingerprint=fp,
            )
        )
        built += 1
    return manifests


def finalize(
    spark: SparkSession, out_path: str, *, term_buckets: int = 64
) -> InvertedIndex:
    """Cross-batch merge: union committed batch counts → final four tables
    PLUS the compressed serving chunks (delta+varbyte, block-max).

    This is the reference's fastmerge (Indexer.java:776-902) as ONE
    term-keyed aggregation — Spark's shuffle is the k-way merge. Also writes
    the per-batch metrics table, a merge-phase manifest with the north
    rule's throughput + bytes-compressed metrics, and the snapshot pointer.
    """
    t_merge0 = time.perf_counter()
    snap = snapshot_status(out_path)
    batches = snap["committed_batches"]
    if not batches:
        raise ValueError(f"no committed batches under {out_path}")
    counts = spark.read.parquet(
        *[f"{_batch_dir(out_path, i)}/counts" for i in batches]
    )
    all_docs = spark.read.parquet(
        *[f"{_batch_dir(out_path, i)}/docs" for i in batches]
    )

    # enriched counts already carry in-batch (per-doc) maxcnt + length
    per_doc = counts.groupBy("doc_id").agg(
        F.max("maxcnt").alias("maxcnt"), F.max("length").alias("length")
    )
    stats = (
        all_docs.join(per_doc, "doc_id", "left")
        .fillna({"length": 0, "maxcnt": 0.0})
    )
    gs = stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("length").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(gs["n_docs"]), float(gs["avgdl"] or 0.0)

    postings = counts.select(
        "term", "doc_id", (F.col("cnt") / F.col("maxcnt")).alias("tf"), "length"
    )
    dictionary = counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    ).withColumn(
        "idf",
        F.log2((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
    )
    global_stats = spark.createDataFrame(
        [(n_docs, avgdl)], "n_docs long, avgdl double"
    )

    idx = InvertedIndex(
        counts=counts, postings_flat=postings, dictionary=dictionary,
        doc_stats=stats, global_stats=global_stats, n_docs=n_docs, avgdl=avgdl,
    )
    from .build import save_index

    save_index(idx, f"{out_path}/index", term_buckets=term_buckets)

    # serving chunks: delta+varbyte + block-max via the streaming compressor
    from .compress import build_postings_compressed_sorted, compression_metrics

    comp = build_postings_compressed_sorted(counts, stats, avgdl)
    comp.write.mode("overwrite").parquet(f"{out_path}/index/postings_comp")
    cm = (
        compression_metrics(spark.read.parquet(f"{out_path}/index/postings_comp"))
        .agg(
            F.sum("bytes_compressed").alias("bytes_compressed"),
            F.sum("df_chunk").alias("postings"),
        )
        .collect()[0]
    )
    merge_wall = time.perf_counter() - t_merge0
    merge_manifest = {
        "wall_seconds": round(merge_wall, 4),
        "n_postings": int(cm["postings"]),
        "postings_per_sec": (
            round(int(cm["postings"]) / merge_wall, 2) if merge_wall > 0 else None
        ),
        "bytes_compressed": int(cm["bytes_compressed"]),
        "bytes_per_posting": round(
            int(cm["bytes_compressed"]) / max(int(cm["postings"]), 1), 3
        ),
    }

    metrics_rows = []
    for i in batches:
        with open(_manifest_path(out_path, i)) as fh:
            m = json.load(fh)
        metrics_rows.append((
            m["batch"], m["n_docs"], m["n_postings"], m["bytes_written"],
            m["wall_seconds"], m["docs_per_sec"], m["postings_per_sec"],
        ))
    spark.createDataFrame(
        metrics_rows,
        "batch int, n_docs long, n_postings long, bytes_written long, "
        "wall_seconds double, docs_per_sec double, postings_per_sec double",
    ).write.mode("overwrite").parquet(f"{out_path}/metrics")

    pointer = {
        "format_version": _FMT_VERSION,
        "committed_batches": batches,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "index_path": f"{out_path}/index",
        "merge_metrics": merge_manifest,
    }
    tmp = f"{out_path}/snapshot.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(pointer, fh, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_path}/snapshot.json")
    return idx


def snapshot_status(out_path: str) -> dict:
    """Lineage view: which batches are committed, with their metrics."""
    committed, pending = [], []
    bdir = f"{out_path}/batches"
    if os.path.isdir(bdir):
        for name in sorted(os.listdir(bdir)):
            if not name.startswith("batch="):
                continue
            i = int(name.split("=", 1)[1])
            try:
                with open(_manifest_path(out_path, i)) as fh:
                    m = json.load(fh)
                if m.get("committed"):
                    committed.append(i)
                else:
                    pending.append(i)
            except (OSError, ValueError):
                pending.append(i)
    return {"committed_batches": sorted(committed), "pending_batches": pending}


def load_final(spark: SparkSession, out_path: str) -> InvertedIndex:
    return load_index(spark, f"{out_path}/index")
