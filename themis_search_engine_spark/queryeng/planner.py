"""Physical plan selection for serving queries.

The engine has FOUR rank-identical physical plans for BM25 top-k over a
persisted compressed index (PLANS.md records each shape):

* ``local``   — :func:`~themis_search_engine_spark.queryeng.wand.wand_topk_local`:
  in-process pyarrow WAND, ZERO Spark jobs; tens of milliseconds.
* ``single``  — :func:`~themis_search_engine_spark.queryeng.wand.wand_topk_single`:
  ONE Spark job, a task per query running true early-exit WAND.
* ``sharded`` — :func:`~themis_search_engine_spark.queryeng.sharded.wand_topk_sharded`:
  doc-range shards, decode-once-per-batch; the batch THROUGHPUT plan.
* ``batch``   — :func:`~themis_search_engine_spark.queryeng.wand.wand_topk`
  (prune=False): the portable distributed plan (works without a
  persisted layout, e.g. straight off ``build_index`` output).

The reference has exactly one plan (Search.java's sequential loop); a
user switching over shouldn't need to learn four. :func:`choose_query_plan`
is the dispatcher decision as a PURE function — the inputs are the only
things the choice actually depends on (batch size, head-term pressure,
latency-vs-throughput intent, whether a persisted layout exists), so
tests pin the whole matrix — and :func:`search_serving` is the facade
that loads a saved index, prices the query terms with one IN-filtered
dictionary scan, picks the plan, and runs it.

Head-term rule: the single-task plans (``local``, ``single``) serialize
each query in one process/task, so a query containing a term whose df
exceeds ``head_df_frac`` of the corpus would pull that term's full
postings through one lane — exactly the documented bound in
wand_topk_local's docstring. Such queries route to the shard-parallel
plan regardless of batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def choose_query_plan(
    n_queries: int,
    *,
    max_df_frac: float = 0.0,
    interactive: bool = False,
    has_persisted: bool = True,
    interactive_max: int = 4,
    single_max: int = 16,
    head_df_frac: float = 0.05,
) -> dict:
    """{"plan": local|single|sharded|batch, "reasons": [...]} — pure
    deterministic plan choice.

    ``max_df_frac``: highest document-frequency fraction among the
    batch's terms (0 when nothing matched the dictionary).
    ``interactive``: caller wants latency (a serving loop), not batch
    throughput. ``has_persisted``: a saved chunk layout exists on
    driver-shared storage (``local``/``sharded`` need it).
    """
    reasons = []
    head = max_df_frac > head_df_frac
    if head:
        reasons.append(
            f"head term: max df fraction {max_df_frac:.3f} > "
            f"{head_df_frac} — single-lane plans would serialize its "
            "full postings"
        )
    if interactive and n_queries <= interactive_max:
        if head:
            if has_persisted:
                reasons.append(
                    "interactive head-term query served shard-parallel"
                )
                return {"plan": "sharded", "reasons": reasons}
            reasons.append("no persisted layout: distributed batch plan")
            return {"plan": "batch", "reasons": reasons}
        if has_persisted:
            reasons.append(
                f"interactive batch of {n_queries} <= {interactive_max}: "
                "in-process WAND, zero Spark jobs"
            )
            return {"plan": "local", "reasons": reasons}
        reasons.append(
            "no persisted layout: one-job sequential WAND"
        )
        return {"plan": "single", "reasons": reasons}
    if n_queries <= single_max and not head:
        reasons.append(
            f"small batch {n_queries} <= {single_max}, no head term: "
            "one job, true early-exit WAND per query-task"
        )
        return {"plan": "single", "reasons": reasons}
    if has_persisted:
        reasons.append(
            f"batch of {n_queries}: decode-once-per-batch doc-sharded "
            "throughput plan"
        )
        return {"plan": "sharded", "reasons": reasons}
    if not head:
        # measured (BATCH_PLANS.json, 1.2M docs / 4000-query batch): the
        # per-query greedy tasks prune with a running θ and emit ranked
        # rows directly — 3.2x the one-pass chunk plan's throughput with
        # zero extra barriers. The chunk plan only wins when a head term
        # would serialize one query's postings through one task.
        reasons.append(
            f"batch of {n_queries} without persisted layout, no head "
            "term: barrier-free greedy WAND per query-task (3.2x the "
            "one-pass chunk plan, BATCH_PLANS.json)"
        )
        return {"plan": "single", "reasons": reasons}
    reasons.append(
        f"head-term batch of {n_queries} without persisted layout: "
        "distributed one-pass chunk plan"
    )
    return {"plan": "batch", "reasons": reasons}


def choose_scan_filter(
    n_terms_batch: int,
    n_terms_dict: int,
    *,
    max_literals: int = 10_000,
    max_dict_frac: float = 0.1,
) -> dict:
    """{"filter": "inlist"|"join_only", "reasons": [...]} — should the
    batch vocabulary be planted into the chunk scan as a literal IN-list?

    Measured (INLIST_CROSSOVER.json, 300k docs, 1000-query batches over
    vocabulary samples): the IN-list pays while the batch vocabulary is a
    SMALL fraction of the dictionary (row-group pruning on the
    term-sorted layout skips most of the scan) and turns into pure
    overhead as coverage grows — at full-dictionary coverage it prunes
    nothing and costs >2x (predicate eval + plan bloat). The inner join
    with the broadcast qterms frame always applies either way, so
    dropping the IN-list never changes results (asserted per level in
    the artifact). ``n_terms_dict`` <= 0 means the layout predates the
    persisted dictionary cardinality — fall back to the literal cap
    alone (the pre-measurement rule). On a 10^12-doc index the pruning
    side of the trade only grows (more files to skip), so the default
    ``max_dict_frac`` is deliberately conservative.
    """
    reasons = []
    if n_terms_batch <= 0:
        return {"filter": "join_only", "reasons": ["empty batch vocab"]}
    if n_terms_batch > max_literals:
        reasons.append(
            f"{n_terms_batch} literals > {max_literals}: plan-size bound"
        )
        return {"filter": "join_only", "reasons": reasons}
    if n_terms_dict > 0 and n_terms_batch / n_terms_dict > max_dict_frac:
        reasons.append(
            f"batch vocab covers {n_terms_batch / n_terms_dict:.2f} of "
            f"the dictionary > {max_dict_frac}: scan pruning no longer "
            "pays for the predicate (INLIST_CROSSOVER.json)"
        )
        return {"filter": "join_only", "reasons": reasons}
    reasons.append(
        f"{n_terms_batch} literals, "
        + (
            f"{n_terms_batch / n_terms_dict:.3f} of the dictionary"
            if n_terms_dict > 0 else "dictionary size unknown"
        )
        + ": row-group pruning pays"
    )
    return {"filter": "inlist", "reasons": reasons}


def search_serving(
    spark: SparkSession,
    path: str,
    queries: dict[int, list[str]],
    k: int = 10,
    *,
    interactive: bool = False,
    plan: str | None = None,
) -> DataFrame:
    """(qid, doc_id, score, rank) — BM25 top-k over the saved serving
    index at ``path``, physical plan chosen automatically (override with
    ``plan`` in {"local","single","sharded","batch"}). All four plans
    are rank-identical (score desc, doc_id asc), so the choice is purely
    physical. ``queries``: qid → normalized (and stemmed, if the index
    is) term lists — queryeng.pipeline.query_term_map's shape.

    Cost before the query itself: one global_stats read and ONE
    IN-filtered dictionary scan bounded by the batch's vocabulary (the
    per-batch idf/df pricing). Long-lived serving loops should hoist
    both and call the plan functions directly (bench.py's hot form).
    """
    from ..indexing.build import DEFAULT_CHUNK_BITS
    from ..indexing.merge import serving_bound_scales
    from .sharded import wand_topk_sharded
    from .wand import wand_topk, wand_topk_local, wand_topk_single

    g = spark.read.parquet(f"{path}/global_stats")
    row = g.collect()[0]
    n_docs = int(row["n_docs"])
    avgdl = float(row["avgdl"])
    n_terms_dict = (
        int(row["n_terms"]) if "n_terms" in g.columns else -1
    )
    cb = (
        int(row["chunk_bits"])
        if "chunk_bits" in g.columns else DEFAULT_CHUNK_BITS
    )
    max_doc_id = int(row["max_doc_id"]) if "max_doc_id" in g.columns else 0
    bs = serving_bound_scales(spark, path)

    vocab = sorted({t for ts in queries.values() for t in ts})
    priced = (
        spark.read.parquet(f"{path}/dictionary")
        .where(F.col("term").isin(vocab))
        .select("term", "df", "idf")
        .collect()
        if vocab else []
    )
    idf_map = {r["term"]: float(r["idf"]) for r in priced}
    max_df_frac = (
        max(int(r["df"]) for r in priced) / max(n_docs, 1) if priced else 0.0
    )

    decision = (
        {"plan": plan, "reasons": ["forced by caller"]}
        if plan is not None
        else choose_query_plan(
            len(queries), max_df_frac=max_df_frac, interactive=interactive
        )
    )
    chosen = decision["plan"]
    use_inlist = (
        choose_scan_filter(len(vocab), n_terms_dict)["filter"] == "inlist"
    )
    if chosen == "local":
        pdf = wand_topk_local(
            f"{path}/postings_comp", queries, idf_map, avgdl, k,
            chunk_bits=cb, bound_scales=bs,
        )
        return spark.createDataFrame(
            pdf, "qid int, doc_id long, score double, rank int"
        )
    if chosen == "single":
        comp = spark.read.parquet(f"{path}/postings_comp")
        return wand_topk_single(
            queries, comp, None, avgdl, k,
            chunk_bits=cb, idf_map=idf_map, bound_scales=bs,
            inlist=use_inlist,
        )
    if chosen == "sharded":
        return wand_topk_sharded(
            spark, f"{path}/postings_comp", queries, None, avgdl,
            max_doc_id, k, chunk_bits=cb, idf_map=idf_map,
        )
    if chosen == "batch":
        comp = spark.read.parquet(f"{path}/postings_comp")
        qt = spark.createDataFrame(
            [(int(q), t) for q, ts in queries.items() for t in ts],
            "qid long, term string",
        )
        dictionary = spark.read.parquet(f"{path}/dictionary")
        return wand_topk(
            qt, comp, dictionary, avgdl, k, prune=False,
            chunk_bits=cb, term_list=vocab, bound_scales=bs,
            inlist=use_inlist,
        )
    raise ValueError(f"unknown plan {chosen!r}")
