"""Metadata-filtered retrieval and faceted match counts.

The reference serves pure text queries (Search.java:52-99 walks the
ranked list with no document-attribute restriction). A web corpus needs
both of the classic attribute surfaces a search engine bolts onto that
ranked list:

* **filtered retrieval** — BM25 top-k restricted to documents matching a
  metadata predicate (``lang = 'en'``, a site allow-list, a crawl-date
  range);
* **facet counts** — for each query, the distribution of *matching*
  documents over an attribute (the "English (1 423) / German (211)"
  sidebar).

Scale design (100 TB corpus, 10^12 docs):

* The candidate set is bounded by the query terms' postings (the IN-list
  pushed scan of ``bm25.bm25_score_all``), never the corpus — both ops
  start from that same pruned join.
* The attribute table is a column-pruned parquet scan (``doc_id`` + the
  referenced attrs only); the predicate is pushed into the scan
  (``PushedFilters`` on lang/source), so a selective filter reads only
  matching row groups.
* The filter joins candidates on ``doc_id`` **below** the score
  aggregation, so the groupBy shuffles only surviving rows. Join
  strategy is Catalyst's choice: a selective predicate (rare lang,
  small site list) broadcasts; a broad one (lang='en' ≈ half the web)
  sort-merge-joins on doc_id — bounded by the candidate count, not the
  corpus. Callers with a known-tiny filter can force ``broadcast=True``.
* The zero-join scale path is build-time denormalization: pass
  ``attr_cols`` to ``indexing.build.build_index`` equivalents the same
  way doc length is denormalized into postings (build.py:106-112), and
  the predicate becomes a codegen'd per-posting-row filter. This module
  is the join-based form that needs no index rebuild.
* Facet counting is two map-side-combinable aggregations: distinct
  (qid, doc_id) first (partial-agg before shuffle), then the tiny
  (qid, facet-value) rollup — output is |queries| × |facet values| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bm25 import MAX_PRUNE_LITERALS, bm25_score_all, topk


def filter_doc_ids(
    doc_attrs: DataFrame, predicate: Column, *, broadcast: bool = False
) -> DataFrame:
    """doc_ids surviving a metadata predicate — a column-pruned,
    filter-pushed scan of the attribute table. ``broadcast=True`` hints
    the planner when the caller knows the predicate is highly selective
    (avoid it for broad predicates: the broadcast would be corpus-sized).
    """
    ids = doc_attrs.where(predicate).select("doc_id")
    return F.broadcast(ids) if broadcast else ids


def bm25_topk_filtered(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    doc_attrs: DataFrame,
    predicate: Column,
    k: int = 10,
    *,
    broadcast_filter: bool = False,
    topk_fn=topk,
) -> DataFrame:
    """BM25 top-k over only the documents matching ``predicate``.

    The semi-join restriction sits on the postings side BEFORE scoring,
    so Catalyst plants both prunings into the same scan subtree: the
    batch term IN-list (pushed to parquet) and the doc_id semi-join.
    Scoring, aggregation, and the salted two-phase top-k then see only
    surviving rows — a filtered query is strictly cheaper than its
    unfiltered twin, never a post-filter of it (post-filtering top-k
    would also be WRONG: it returns < k rows whenever any top doc is
    filtered out, instead of the next-best matching docs).
    """
    allowed = filter_doc_ids(doc_attrs, predicate, broadcast=broadcast_filter)
    restricted = postings_flat.join(allowed, "doc_id", "left_semi")
    scored = bm25_score_all(
        qterms, restricted, dictionary, doc_stats, avgdl,
        term_list=[r["term"] for r in qterms.select("term").distinct().collect()],
    )
    return topk_fn(scored, k)


def matching_docs(
    qterms: DataFrame,
    postings_flat: DataFrame,
    term_list: list[str] | None = None,
) -> DataFrame:
    """Distinct (qid, doc_id) candidates of a query batch — the
    existential match set (Q6 semantics) every facet/filter op starts
    from. IN-list pushed scan + broadcast qterms join + partial-agg
    distinct; bounded by the batch terms' postings."""
    terms = (
        term_list
        if term_list is not None
        else [r["term"] for r in qterms.select("term").distinct().collect()]
    )
    pruned = postings_flat
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        pruned = postings_flat.where(F.col("term").isin(list(terms)))
    q = F.broadcast(qterms.select("qid", "term").distinct())
    return pruned.join(q, "term").select("qid", "doc_id").distinct()


def common_terms_topk(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    n_docs: int,
    k: int = 10,
    *,
    max_df_frac: float = 0.05,
    topk_fn=topk,
) -> DataFrame:
    """Head-term demotion (Lucene's CommonTermsQuery): query terms whose
    df exceeds ``max_df_frac``·N stop GENERATING candidates — they only
    contribute score to docs some rare term already matched. On a web
    corpus a head term ("www", "home") matches 10%+ of 10¹² docs; pure
    OR retrieval drags that term's full posting list through scoring for
    every query containing it. Here the candidate set is the RARE terms'
    match set, and the common terms' postings are read through a doc_id
    semi-join on those candidates — both prunings sit below the score
    aggregation, so the head term's posting list is never aggregated
    corpus-wide. Scores of surviving docs are EXACTLY the full-OR BM25
    sum (both term classes contribute); what changes is which docs
    qualify — docs matching only common terms drop, the CommonTermsQuery
    contract.

    Per-query fallback: a query whose known terms are ALL common treats
    them all as rare (plain OR) — it stays answerable, like Lucene's
    must-match fallback. Classification is driver-side over the batch
    vocabulary (a query-bounded dictionary lookup, the Q1 shape).
    """
    qrows = [
        (int(r["qid"]), r["term"])
        for r in qterms.select("qid", "term").distinct().collect()
    ]
    terms = sorted({t for _, t in qrows})
    df_map = {
        r["term"]: int(r["df"])
        for r in dictionary.where(F.col("term").isin(terms))
        .select("term", "df").collect()
    }
    cutoff = max_df_frac * n_docs
    by_qid: dict[int, list[str]] = {}
    for qid, t in qrows:
        by_qid.setdefault(qid, []).append(t)
    rare_pairs: list[tuple[int, str]] = []
    for qid, ts in by_qid.items():
        known = [t for t in ts if t in df_map]
        rare = [t for t in known if df_map[t] <= cutoff]
        rare_pairs.extend((qid, t) for t in (rare or known))
    spark = qterms.sparkSession
    rare_union = sorted({t for _, t in rare_pairs})
    common_union = sorted(set(df_map) - set(rare_union))

    rq = F.broadcast(
        spark.createDataFrame(
            rare_pairs or [(None, None)], "qid int, term string"
        ).where("qid is not null")
    )
    pruned_r = postings_flat
    if 0 < len(rare_union) <= MAX_PRUNE_LITERALS:
        pruned_r = postings_flat.where(F.col("term").isin(rare_union))
    cand = pruned_r.join(rq, "term").select("qid", "doc_id").distinct()

    legs = pruned_r.where(F.col("term").isin(rare_union))
    if common_union:
        pruned_c = postings_flat.where(F.col("term").isin(common_union))
        legs = legs.unionByName(
            pruned_c.join(
                cand.select("doc_id").distinct(), "doc_id", "left_semi"
            )
        )
    scored = bm25_score_all(
        qterms, legs, dictionary, doc_stats, avgdl, term_list=terms
    )
    return topk_fn(scored.join(cand, ["qid", "doc_id"], "left_semi"), k)


def sort_by_field_topk(
    qterms: DataFrame,
    postings_flat: DataFrame,
    doc_attrs: DataFrame,
    sort_col: str,
    k: int = 10,
    *,
    ascending: bool = False,
    term_list: list[str] | None = None,
) -> DataFrame:
    """Field-sorted retrieval (the Lucene ``Sort(SortField)`` surface):
    the query's match set ordered by a DOCUMENT ATTRIBUTE instead of
    relevance — "newest first", "largest first" — the other half of
    every search UI's sort dropdown.

    Candidates are :func:`matching_docs` (IN-pushed existential scan);
    the attribute join is doc_id-keyed and candidate-bounded (a
    column-pruned scan of the attr table, never the corpus). The
    per-query top-k is a rank window over (attr, doc_id) — Spark
    rewrites ``rank <= k`` to WindowGroupLimit, so each task keeps a
    k-row heap per query rather than sorting its full candidate slice; a
    head-term query's match set never fully sorts anywhere. At 10¹² docs
    the scale lever is the same one the score path uses: the window
    input is |matches|, already bounded by the batch terms' postings.
    """
    from pyspark.sql.window import Window

    cand = matching_docs(qterms, postings_flat, term_list)
    vals = doc_attrs.select("doc_id", F.col(sort_col).alias("sort_val"))
    order = (
        F.asc("sort_val") if ascending else F.desc("sort_val"),
        F.asc("doc_id"),
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        cand.join(vals, "doc_id")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", "sort_val", "rank")
    )


def conjunctive_scores(
    qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    *,
    min_match: int | None = None,
) -> DataFrame:
    """BM25 scores under AND semantics (or ``min_match``-of-n): a doc
    qualifies only if it contains ALL the query's distinct KNOWN terms
    (default), or at least ``min_match`` of them.

    The reference scores bag-of-words OR only (OkapiBM25.java walks the
    union); conjunctive matching is the web-search default ("all words").
    Unknown terms (df = 0) are excluded from the requirement — they can
    never match, and the reference likewise scores only dictionary terms.

    Plan: identical to the OR scorer (IN-pushed postings scan, broadcast
    qterms⋈dictionary, one groupBy) — the AND constraint rides the SAME
    aggregation as a countDistinct + a post-agg filter against the
    per-qid requirement (broadcast, |Q| rows). No extra shuffle; the
    filter drops partial matches before top-k sees them.
    """
    from .bm25 import MAX_PRUNE_LITERALS, bm25_part_expr

    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    pruned = postings_flat
    if 0 < len(terms) <= MAX_PRUNE_LITERALS:
        pruned = postings_flat.where(F.col("term").isin(list(terms)))
    q = F.broadcast(qterms.join(dictionary.select("term", "idf"), "term"))
    need = q.groupBy("qid").agg(
        F.countDistinct("term").alias("_need")
    )
    joined = pruned.join(q, "term")
    if "length" not in postings_flat.columns:
        joined = joined.join(doc_stats.select("doc_id", "length"), "doc_id")
    scored = (
        joined.select("qid", "doc_id", "term", bm25_part_expr(avgdl=avgdl).alias("part"))
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("part").alias("score"),
            F.countDistinct("term").alias("_matched"),
        )
        .join(F.broadcast(need), "qid")
    )
    req = (
        F.least(F.lit(int(min_match)), F.col("_need"))
        if min_match is not None
        else F.col("_need")
    )
    return scored.where(F.col("_matched") >= req).select(
        "qid", "doc_id", "score"
    )


def collapse_topk(
    scored: DataFrame,
    doc_attrs: DataFrame,
    group_col: str = "source",
    per_group: int = 2,
    k: int = 10,
) -> DataFrame:
    """Result diversification ("site collapse"): top-k by score, but at
    most ``per_group`` results per ``group_col`` value per query — the
    web-search rule that one host must not monopolize the page.

    Two windows, both salt-free but bounded: the per-(qid, group) rank
    partitions the candidate set much finer than per-qid (a hot query's
    candidates spread over many hosts — the per-partition sort is
    |candidates per host|, not |candidates|), and the final per-qid
    window sorts only the ≤ per_group survivors of each group. The
    attribute join is keyed on doc_id, bounded by the candidate set.
    Deterministic: rounded score desc, doc_id asc at both levels.
    Output: (qid, doc_id, score, rank) with ``rank`` the diversified
    1..k position.
    """
    from pyspark.sql.window import Window

    joined = scored.join(doc_attrs.select("doc_id", group_col), "doc_id")
    wg = Window.partitionBy("qid", group_col).orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    survivors = joined.withColumn("_gr", F.row_number().over(wg)).where(
        F.col("_gr") <= per_group
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(wq).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", F.round("score", 6).alias("score"), "rank")
    )


def facet_counts(
    qterms: DataFrame,
    postings_flat: DataFrame,
    doc_attrs: DataFrame,
    facet_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Per-query facet distribution: for each qid and each combination of
    ``facet_cols`` values, how many distinct documents match the query.

    Plan: distinct (qid, doc_id) first (map-side combinable — the heavy
    shuffle is the candidate set, deduped before the join), then join
    the column-pruned attribute scan on doc_id, then the tiny rollup.
    Output rows = |queries| × Π|facet cardinalities| — driver-safe at
    any corpus size for categorical facets.
    """
    cand = matching_docs(qterms, postings_flat)
    attrs = doc_attrs.select("doc_id", *facet_cols)
    return (
        cand.join(attrs, "doc_id")
        .groupBy("qid", *facet_cols)
        .agg(F.count("*").alias("n_docs"))
    )


def range_facets(
    qterms: DataFrame,
    postings_flat: DataFrame,
    doc_attrs: DataFrame,
    value_col: str,
    edges: list[float],
) -> DataFrame:
    """(qid, bucket, lo, hi, n_docs) — numeric histogram facet over the
    query's matching docs (the price-slider / date-range sidebar next to
    :func:`facet_counts`' categorical one). ``edges`` are explicit
    ascending bucket boundaries; bucket i covers [edges[i], edges[i+1])
    with the last bucket closed on the right, values outside the range
    fall into bucket -1 (reported, so totals always reconcile with the
    hit count).

    Plan: same shape as facet_counts — distinct candidates first, a
    column-pruned attribute join, then the bucket id computed as ONE
    codegen CASE chain (no per-row Python, no second scan) and a rollup
    of |queries| × (|edges|) rows. Explicit driver-known edges (not
    percentile-based) keep the op deterministic and one-pass; compose
    with quantile_sketch when data-driven edges are wanted.
    """
    if len(edges) < 2 or sorted(edges) != list(edges):
        raise ValueError(f"edges must be >= 2 ascending values: {edges}")
    v = F.col(value_col)
    bucket = F.when(v < edges[0], F.lit(-1))
    for i in range(len(edges) - 1):
        hi_ok = (v <= edges[i + 1]) if i == len(edges) - 2 else (v < edges[i + 1])
        bucket = bucket.when((v >= edges[i]) & hi_ok, F.lit(i))
    bucket = bucket.otherwise(F.lit(-1))
    idx1 = (F.col("bucket") + 1).cast("int")
    lo = F.when(F.col("bucket") >= 0, F.element_at(
        F.array(*[F.lit(float(e)) for e in edges[:-1]]), idx1
    ))
    hi = F.when(F.col("bucket") >= 0, F.element_at(
        F.array(*[F.lit(float(e)) for e in edges[1:]]), idx1
    ))
    cand = matching_docs(qterms, postings_flat)
    return (
        cand.join(doc_attrs.select("doc_id", value_col), "doc_id")
        .select("qid", bucket.cast("long").alias("bucket"))
        .groupBy("qid", "bucket")
        .agg(F.count("*").alias("n_docs"))
        .select("qid", "bucket", lo.alias("lo"), hi.alias("hi"), "n_docs")
    )


def negated_scores(
    qterms: DataFrame,
    neg_qterms: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
) -> DataFrame:
    """BM25 scores with NOT semantics ("spark join -merge"): positive
    terms score exactly as the standard OR plan; any doc containing ANY
    of the query's negated terms is excluded from that query's results.

    The reference has no negation (QueryProcessor.java walks positive
    bags only); '-term' is the remaining boolean web-search staple after
    AND (conjunctive_scores) and OR (the default).

    Plan: the scored frame left_anti-joins the negated existential match
    set (matching_docs: IN-pushed scan + broadcast neg-qterms + partial-
    agg distinct) on (qid, doc_id). Both sides already hash-partition on
    that key; anti join is linear and skew follows document frequency —
    a stopword negation is as expensive as a stopword query, no worse.
    Queries with no negated terms pass through untouched (empty anti
    side).
    """
    from .bm25 import bm25_score_all

    scored = bm25_score_all(
        qterms, postings_flat, dictionary, doc_stats, avgdl
    )
    excl = matching_docs(neg_qterms, postings_flat)
    return scored.join(excl, ["qid", "doc_id"], "left_anti")


def grouped_topk(
    scored: DataFrame,
    doc_attrs: DataFrame,
    group_col: str = "source",
    n_groups: int = 5,
    per_group: int = 3,
) -> DataFrame:
    """Group-major retrieval (Elasticsearch ``collapse`` + ``inner_hits``
    / the ``top_hits`` aggregation): rank GROUPS by their best member's
    score, keep the top ``n_groups`` per query, and return each group's
    top ``per_group`` documents — "best host, with its best pages under
    it", the result shape site-clustered SERPs render. collapse_topk is
    the flat diversified ranking; this is its hierarchical sibling.

    Output: (qid, group, group_rank, doc_id, score, inner_rank).

    Plan: the attribute join is candidate-bounded (doc_id-keyed); the
    inner window partitions by (qid, group) — per-partition sort is one
    group's candidates, never the query's; the group ranking runs over
    ≤ |groups| one-row aggregates. Deterministic at the house grain:
    groups by (best rounded score desc, group asc), inner hits by
    (rounded score desc, doc_id asc).
    """
    from pyspark.sql.window import Window

    joined = scored.join(
        doc_attrs.select("doc_id", F.col(group_col).alias("group")),
        "doc_id",
    )
    wg = Window.partitionBy("qid", "group").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    inner = joined.withColumn(
        "inner_rank", F.row_number().over(wg).cast("long")
    ).where(F.col("inner_rank") <= per_group)
    heads = (
        inner.where(F.col("inner_rank") == 1)
        .select(
            "qid", "group",
            F.round("score", 6).alias("_best"),
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc("_best"), F.asc("group")
    )
    top_groups = (
        heads.withColumn("group_rank", F.row_number().over(wq).cast("long"))
        .where(F.col("group_rank") <= n_groups)
        .select("qid", "group", "group_rank")
    )
    return (
        inner.join(top_groups, ["qid", "group"])
        .select(
            "qid", "group", "group_rank", "doc_id",
            F.round("score", 6).alias("score"), "inner_rank",
        )
    )
