#!/usr/bin/env python
"""Spark-free profiler for the sharded serving kernel (_score_shard).

Builds (once, cached in /dev/shm) a synthetic serving index at one or more
chunk_bits layouts, then times the PURE scoring kernel sequentially over
the shard list a serving cluster would run in parallel — total kernel
seconds ≈ per-core work, the number the layout decision trades off.

Phase breakdown comes from an instrumented copy of the kernel loop so the
production function stays unchanged.

Usage:
  python scripts/profile_shard.py                 # 300k docs, cb 16 vs 13
  SPARK_GRAFT_PROF_DOCS=600000 python scripts/profile_shard.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def build_index(n_docs: int, chunk_bits: int, path: str) -> None:
    """Build the synthetic serving index once; cached across profiler runs."""
    if os.path.exists(f"{path}/global_stats"):
        return
    from themis_search_engine_spark.corpus import extract_text, synth_pages
    from themis_search_engine_spark.indexing.build import build_and_save_serving
    from themis_search_engine_spark.session import get_spark

    spark = get_spark(f"prof-build-{chunk_bits}")
    pages = synth_pages(spark, n_docs, partitions=64)
    docs = extract_text(pages).withColumn(
        "doc_id",
        __import__("pyspark.sql.functions", fromlist=["F"]).regexp_extract(
            "url", r"/p/(\d+)$", 1
        ).cast("long"),
    )
    build_and_save_serving(docs, path, chunk_bits=chunk_bits)
    spark.stop()


def load_meta(path: str):
    gs = pq.read_table(f"{path}/global_stats").to_pylist()[0]
    d = pq.read_table(f"{path}/dictionary", columns=["term", "idf"])
    idf = dict(zip(d["term"].to_pylist(), d["idf"].to_pylist()))
    return gs, idf


def make_batch(n_queries: int):
    from themis_search_engine_spark.queryeng.pipeline import query_term_map
    from themis_search_engine_spark.queryset import synth_reference_queries

    return query_term_map(synth_reference_queries(n_queries), stem=True)


def shard_ranges(n_chunks: int, parallelism: int):
    n_shards = max(1, min(n_chunks, parallelism * 2))
    base_sz, rem = divmod(n_chunks, n_shards)
    out, lo = [], 0
    for i in range(n_shards):
        hi = lo + base_sz + (1 if i < rem else 0)
        out.append((lo, hi))
        lo = hi
    return out


def run_kernel(path: str, gs, idf_all, qmap, k, parallelism, impl):
    from themis_search_engine_spark.queryeng import sharded

    vocab = sorted({t for ts in qmap.values() for t in ts})
    idf = {t: idf_all[t] for t in vocab if t in idf_all}
    by_term: dict[str, set] = {}
    for qid, ts in qmap.items():
        for t in ts:
            if t in idf:
                by_term.setdefault(t, set()).add(qid)
    by_term = {t: frozenset(qs) for t, qs in by_term.items()}
    kept = tuple(sorted(by_term))
    cb = int(gs["chunk_bits"])
    n_chunks = (int(gs["max_doc_id"]) >> cb) + 1
    shards = shard_ranges(n_chunks, parallelism)
    fn = getattr(sharded, impl)
    attempts = int(os.environ.get("SPARK_GRAFT_PROF_ATTEMPTS", 3))
    wall = float("inf")
    for _ in range(attempts):
        t0 = time.perf_counter()
        blobs = []
        for rng in shards:
            blobs.append(
                fn(f"{path}/postings_comp", rng, kept, by_term, idf, k,
                   float(gs["avgdl"]), cb)
            )
        wall = min(wall, time.perf_counter() - t0)
    # global merge (same as driver merge) for a result digest
    live = [b for b in blobs if b is not None]
    qa = np.concatenate([np.frombuffer(b[0], dtype=np.int64) for b in live])
    da = np.concatenate([np.frombuffer(b[1], dtype=np.int64) for b in live])
    sa = np.concatenate([np.frombuffer(b[2], dtype=np.float64) for b in live])
    order = np.lexsort((da, -sa, qa))
    qs_, ds_, ss_ = qa[order], da[order], sa[order]
    grp = np.flatnonzero(np.r_[True, qs_[1:] != qs_[:-1]])
    sizes = np.diff(np.r_[grp, len(qs_)])
    pos = np.arange(len(qs_)) - np.repeat(grp, sizes)
    keepm = pos < k
    import hashlib

    digest = hashlib.md5(
        qs_[keepm].tobytes() + ds_[keepm].tobytes() + ss_[keepm].tobytes()
    ).hexdigest()[:12]
    return wall, len(shards), digest, int(keepm.sum())


def main():
    n_docs = int(os.environ.get("SPARK_GRAFT_PROF_DOCS", 300_000))
    n_queries = int(os.environ.get("SPARK_GRAFT_PROF_QUERIES", 2000))
    parallelism = int(os.environ.get("SPARK_GRAFT_PROF_PAR", 16))
    bits = [int(b) for b in
            os.environ.get("SPARK_GRAFT_PROF_BITS", "16,13").split(",")]
    impls = os.environ.get("SPARK_GRAFT_PROF_IMPL", "_score_shard").split(",")
    k = 10

    qmap = make_batch(n_queries)
    out = {"n_docs": n_docs, "n_queries": n_queries,
           "parallelism": parallelism}
    for cb in bits:
        path = f"/dev/shm/themis-prof-{n_docs}-cb{cb}"
        build_index(n_docs, cb, path)
        gs, idf_all = load_meta(path)
        for impl in impls:
            wall, n_shards, digest, rows = run_kernel(
                path, gs, idf_all, qmap, k, parallelism, impl)
            key = f"cb{cb}:{impl}"
            out[key] = {"kernel_sec": round(wall, 3), "shards": n_shards,
                        "digest": digest, "rows": rows}
            print(f"{key}: {wall:.3f}s over {n_shards} shards, "
                  f"{rows} rows, digest {digest}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
