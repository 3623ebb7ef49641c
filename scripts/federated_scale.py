#!/usr/bin/env python
"""Federated / selective serving at scale: build one union serving index
and 4 independently-built sub-indexes over the SAME synthetic corpus,
then measure the three serving modes on a large query batch:

- union      : single-index WAND batch plan (the baseline the federated
               modes must match).
- federated  : federated_wand_topk over the 4 compressed legs with merged
               global stats — VERIFIED rank-identical to the union plan
               at the 6-dp grain (the federation correctness claim, here
               checked at 100x the driver-testdata scale).
- selective  : CORI top-m routing (m=2 of 4) — recall@10 vs the union
               ranking is REPORTED, not asserted (bounded recall is the
               selective contract; the number quantifies the trade).

Protocol mirrors scripts/scaling_workload.py: corpus materialized to
parquet first, tmpfs-backed outputs, an untimed warmup per plan shape,
fresh serving session after the builds. Prints ONE JSON line and writes
FEDERATED_SCALE.json at the repo root.

Env knobs: SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_FED_DOCS
(default 400_000), SPARK_GRAFT_FED_QUERIES (default 1000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from themis_search_engine_spark.corpus import synth_pages  # noqa: E402
from themis_search_engine_spark.indexing.build import (  # noqa: E402
    build_and_save_serving,
    load_serving_index,
)
from themis_search_engine_spark.queryeng import (  # noqa: E402
    qterms_df,
    query_term_list,
)
from themis_search_engine_spark.queryeng.federated import (  # noqa: E402
    federated_wand_topk,
    selective_wand_topk,
)
from themis_search_engine_spark.queryeng.wand import wand_topk  # noqa: E402
from themis_search_engine_spark.queryset import (  # noqa: E402
    synth_reference_queries,
)
from themis_search_engine_spark.session import get_spark  # noqa: E402

N_LEGS = 4
M_SELECT = 2
K = 10


def _rounded_topk_py(rows, k=K):
    """qid -> [doc_id...] : round(score,6) desc, doc_id asc, top-k."""
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(
            (-round(r["score"], 6), r["doc_id"])
        )
    return {q: [d for _, d in sorted(v)[:k]] for q, v in by_q.items()}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_docs = int(os.environ.get("SPARK_GRAFT_FED_DOCS", 400_000))
    n_queries = int(os.environ.get("SPARK_GRAFT_FED_QUERIES", 1000))
    shm = "/dev/shm/themis-fed"
    os.makedirs(shm, exist_ok=True)

    def new_session(tag: str):
        spark = get_spark(
            f"themis-fed-{tag}",
            master=f"local[{cpus}]",
            shuffle_partitions=2 * cpus,
            extra_conf={
                "spark.local.dir": f"{shm}/local",
                "spark.sql.files.maxPartitionBytes": "16m",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        return spark

    spark = new_session("build")
    tmp = tempfile.mkdtemp(prefix="themis_fed_", dir=shm)
    out: dict = {
        "metric": "federated_serving", "cpus": cpus, "n_docs": n_docs,
        "n_legs": N_LEGS, "m_select": M_SELECT, "k": K,
        "n_queries": n_queries,
    }
    try:
        # SPARK_GRAFT_FED_PAGES: reuse a materialized corpus across
        # parallelism levels (the two-level scaling protocol reads
        # identical bytes at both levels)
        pdir = os.environ.get("SPARK_GRAFT_FED_PAGES") or f"{tmp}/pages"
        if not os.path.isdir(pdir):
            synth_pages(spark, n_docs, partitions=64).write.mode(
                "overwrite"
            ).parquet(pdir)
        corpus = spark.read.parquet(pdir).select(
            F.regexp_extract("url", r"/p/(\d+)", 1).cast("long").alias("doc_id"),
            "text",
        )
        t0 = time.perf_counter()
        build_and_save_serving(corpus, f"{tmp}/union", stem=True)
        out["build_union_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        for i in range(N_LEGS):
            build_and_save_serving(
                corpus.where(F.pmod("doc_id", F.lit(N_LEGS)) == i),
                f"{tmp}/leg{i}", stem=True,
            )
        out["build_legs_sec"] = round(time.perf_counter() - t0, 2)

        spark.stop()
        spark = new_session("serve")
        union = load_serving_index(spark, f"{tmp}/union")
        legs = tuple(
            load_serving_index(spark, f"{tmp}/leg{i}") for i in range(N_LEGS)
        )

        queries = synth_reference_queries(n_queries)
        qt = qterms_df(spark, queries, stem=True).cache()
        qt.count()
        tl = query_term_list(queries, stem=True)
        wq = synth_reference_queries(20)
        wqt = qterms_df(spark, wq, stem=True)

        # --- union baseline (wide k=3K raw, rounded top-K in driver) ---
        wand_topk(
            wqt, union.compressed, union.dictionary, union.avgdl, k=K,
            prune=False, chunk_bits=union.chunk_bits,
            term_list=query_term_list(wq, stem=True),
        ).collect()  # warmup
        t0 = time.perf_counter()
        u_rows = wand_topk(
            qt, union.compressed, union.dictionary, union.avgdl, k=3 * K,
            prune=False, chunk_bits=union.chunk_bits, term_list=tl,
        ).collect()
        u_sec = time.perf_counter() - t0
        union_ranks = _rounded_topk_py(u_rows)
        out.update(
            union_query_sec=round(u_sec, 2),
            union_qps=round(n_queries / u_sec, 1),
        )

        # --- federated over 4 legs: must be rank-identical -------------
        federated_wand_topk(
            wqt, legs, k=K, prune=False, round_dp=6
        ).collect()  # warmup
        t0 = time.perf_counter()
        f_rows = federated_wand_topk(
            qt, legs, k=K, prune=False, round_dp=6
        ).collect()
        f_sec = time.perf_counter() - t0
        fed_ranks: dict = {}
        for r in sorted(f_rows, key=lambda r: (r["qid"], r["rank"])):
            fed_ranks.setdefault(r["qid"], []).append(r["doc_id"])
        identical = fed_ranks == union_ranks
        out.update(
            federated_query_sec=round(f_sec, 2),
            federated_qps=round(n_queries / f_sec, 1),
            federated_rank_identical=identical,
        )

        # --- selective m=2 of 4: report recall@10 ----------------------
        selective_wand_topk(
            wqt, legs, k=K, m=M_SELECT, prune=False, round_dp=6
        ).collect()  # warmup
        t0 = time.perf_counter()
        s_rows = selective_wand_topk(
            qt, legs, k=K, m=M_SELECT, prune=False, round_dp=6
        ).collect()
        s_sec = time.perf_counter() - t0
        sel: dict = {}
        for r in s_rows:
            sel.setdefault(r["qid"], set()).add(r["doc_id"])
        recalls = [
            len(sel.get(q, set()) & set(docs)) / len(docs)
            for q, docs in union_ranks.items()
            if docs
        ]
        out.update(
            selective_query_sec=round(s_sec, 2),
            selective_qps=round(n_queries / s_sec, 1),
            selective_recall_at_10=round(sum(recalls) / len(recalls), 4),
            # doc_id%N sharding scatters a query's relevant docs uniformly,
            # so top-m-of-N routing is expected to capture ~m/N of the
            # union top-k REGARDLESS of the selection formula — the
            # classic selective-search result (Kulkarni & Callan): recall
            # above this floor requires TOPICAL shard assignment, which a
            # synthetic topic-free corpus cannot exhibit. Measured recall
            # ≈ this floor is therefore the honest expected outcome here.
            expected_random_shard_recall=round(M_SELECT / N_LEGS, 4),
        )

        print(json.dumps(out))
        dst = os.environ.get(
            "SPARK_GRAFT_FED_OUT", os.path.join(HERE, "FEDERATED_SCALE.json")
        )
        with open(dst, "w") as fh:
            json.dump(out, fh, indent=1)
        if not identical:
            sys.exit(1)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
