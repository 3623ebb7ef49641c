"""Block-max WAND top-k over compressed, range-chunked postings.

The reference scores every candidate then fully sorts (OkapiBM25.java:
291-308). The north rule asks for a block-max WAND *physical* design with
identical semantics ("score everything, sort, take k"). Sequential WAND
doesn't map onto a cluster, so this is the distributed adaptation:

 phase 0  chunk upper bounds: for each (qid, chunk), ub = Σ_terms
          max(idf·core_max, idf·core_min) — pure Column arithmetic over the
          chunk METADATA only (no posting bytes touched). Handles negative
          idf (df > N/2) correctly via the min bound.
 phase 1  score the top-P chunks per qid by ub exactly → threshold θ =
          k-th best score found (lower bound of the final k-th score).
 phase 2  score only chunks with ub ≥ θ (the WAND skip: chunks whose best
          possible doc can't reach the current top-k are never decoded) →
          union with phase 1, global top-k.

Planner note (measured, BENCH_SCALING.json): the pruned path is the
LATENCY plan — a single query over a big corpus decodes only the chunks
that can reach the top-k. For BATCH throughput (hundreds of queries in one
job) ``prune=False`` is the better physical plan: the probe→θ→rest chain
costs three extra synchronization barriers per job, and with a whole batch
in flight the chunk-scoring work is already dense, so barrier elimination
beats chunk skipping (4→16-core scaling efficiency 0.62 pruned vs 0.80
unpruned on the 1.2M-doc workload, with 24% higher absolute q/s).

Exact chunk scoring is applyInPandas per (qid, chunk): varbyte-decode each
term's slice, accumulate into a dense per-offset float64 array (chunks are
doc-range aligned across terms, so accumulation is O(postings) numpy
scatter-add), emit the chunk-local top-k — a doc outside its chunk's top-k
can't be in the global top-k.

Rank/score identity with the naive DataFrame path is asserted in tests
(modulo float-sum order at ~1e-15, with deterministic doc_id tie-breaks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..indexing.compress import DEFAULT_CHUNK_BITS, vb_decode

K1 = 2.0
B = 0.75

_SCORED_SCHEMA = StructType(
    [
        StructField("qid", IntegerType(), False),
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def _chunk_scorer(k: int, avgdl: float, chunk_bits: int):
    chunk_size = 1 << chunk_bits

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        base = int(pdf["chunk"].iloc[0]) << chunk_bits
        scores = np.zeros(chunk_size, dtype=np.float64)
        matched = np.zeros(chunk_size, dtype=bool)
        # deterministic accumulation order: by term
        for _, row in pdf.sort_values("term").iterrows():
            deltas = vb_decode(row["doc_bytes"]).astype(np.int64)
            offs = np.cumsum(deltas)  # doc_id - base (first delta is offset)
            cnt = vb_decode(row["cnt_bytes"]).astype(np.float64)
            mc = vb_decode(row["mc_bytes"]).astype(np.float64)
            dl = vb_decode(row["dl_bytes"]).astype(np.float64)
            tf = cnt / mc
            idf = float(row["idf"])
            part = idf * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * dl / avgdl)
            )
            scores[offs] += part
            matched[offs] = True
        offs = np.nonzero(matched)[0]
        sc = scores[offs]
        if len(offs) > k:
            # chunk-local top-k by (score desc, doc_id asc)
            order = np.lexsort((offs, -sc))[:k]
            offs, sc = offs[order], sc[order]
        return pd.DataFrame(
            {"qid": qid, "doc_id": offs + base, "score": sc}
        )

    return score_chunk


def wand_topk(
    qterms: DataFrame,
    compressed: DataFrame,
    dictionary: DataFrame,
    avgdl: float,
    k: int = 10,
    *,
    chunk_bits: int = DEFAULT_CHUNK_BITS,
    probe_chunks: int = 2,
    prune: bool = True,
    term_list: list[str] | None = None,
) -> DataFrame:
    """(qid, doc_id, score, rank) — top-k per query over compressed chunks.

    ``term_list``: the batch's distinct (already-stemmed) terms, if the
    caller knows them driver-side (qterms_df callers always do) — saves the
    collect job that would otherwise derive them.
    """
    from .bm25 import MAX_PRUNE_LITERALS

    # plant the batch term set into the chunk scan (same pushdown as
    # bm25_score_all): parquet dictionary/row-group pruning on `term`
    terms = (
        term_list
        if term_list is not None
        else [r["term"] for r in qterms.select("term").distinct().collect()]
    )
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        compressed = compressed.where(F.col("term").isin(list(terms)))
    q = F.broadcast(qterms.select("qid", "term").join(
        dictionary.select("term", "idf"), "term"
    ))
    joined = compressed.join(q, "term")

    scorer = _chunk_scorer(k, avgdl, chunk_bits)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))

    if not prune:
        # batch plan: one scoring pass over all matched chunks, no barriers
        ranked = (
            joined.groupBy("qid", "chunk")
            .applyInPandas(scorer, _SCORED_SCHEMA)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        return ranked

    joined = joined.localCheckpoint(eager=False)  # reused by both phases

    # phase 0: chunk upper bounds from metadata only
    ub = joined.groupBy("qid", "chunk").agg(
        F.sum(
            F.greatest(
                F.col("idf") * F.col("core_max"),
                F.col("idf") * F.col("core_min"),
            )
        ).alias("ub")
    )
    wub = Window.partitionBy("qid").orderBy(F.desc("ub"), F.asc("chunk"))
    ub_ranked = ub.withColumn("ubrank", F.row_number().over(wub))
    ub_ranked = ub_ranked.localCheckpoint(eager=False)

    # phase 1: exact-score the probe chunks → per-qid threshold θ (k-th best)
    probe_keys = ub_ranked.where(F.col("ubrank") <= probe_chunks).select(
        "qid", "chunk"
    )
    probe_scored = (
        joined.join(probe_keys, ["qid", "chunk"])
        .groupBy("qid", "chunk")
        .applyInPandas(scorer, _SCORED_SCHEMA)
    )
    probe_scored = probe_scored.localCheckpoint(eager=False)
    theta = (
        probe_scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == k)
        .select("qid", F.col("score").alias("theta"))
    )

    # phase 2: remaining chunks that could still beat θ
    rest_keys = (
        ub_ranked.where(F.col("ubrank") > probe_chunks)
        .join(theta, "qid", "left")
        .where(F.col("theta").isNull() | (F.col("ub") >= F.col("theta")))
        .select("qid", "chunk")
    )
    rest_scored = (
        joined.join(rest_keys, ["qid", "chunk"])
        .groupBy("qid", "chunk")
        .applyInPandas(scorer, _SCORED_SCHEMA)
    )

    return (
        probe_scored.unionByName(rest_scored)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
