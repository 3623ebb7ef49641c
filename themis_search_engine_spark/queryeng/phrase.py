"""Phrase search over a positional index.

The classic exact-phrase operator the reference lacks entirely (its
index stores max-normalized tf only — Indexer.java keeps no positions;
query evaluation is bag-of-words). A positional table makes "spark
shuffle join" as a QUOTED phrase answerable: docs where the terms occur
at consecutive token positions.

Positions are over the FULL normalized token sequence (P2 normalization,
stopwords KEPT): removing stopwords before positioning would make
"state of the art" unfindable — the adjacency relation is only
meaningful on the unfiltered sequence. This table is separate from the
retrieval postings (which stay stopword-filtered, per the reference's
pipeline); at build time it is one extra posexplode over the same
tokenize pass.

Scale design:

* the positional table is (doc_id, term, pos) — ~|tokens| rows, written
  bucketed/partitioned by term exactly like the postings table, so each
  phrase term's positions come off a term-pruned scan (IN-list pushdown
  on the scan here).
* an n-term phrase is n-1 equi-joins on (doc_id, pos − offset): each
  join is keyed, bounded by the phrase terms' position lists, and
  Catalyst/AQE orders the rarest term first. No windows over the corpus,
  no per-doc Python.
* phrase frequency (occurrence count per doc) is a map-side-combinable
  count; ranking is the standard deterministic top-k window over
  |matching docs| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..textproc import normalize_expr


def positional_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, pos) — 1-based token positions over the normalized,
    UNFILTERED token stream."""
    toks = F.filter(
        F.split(normalize_expr(F.col(text_col)), r"\s+"),
        lambda t: t != "",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


def phrase_occurrences(
    pos_index: DataFrame, phrase_terms: list[str], *, max_gap: int = 0
) -> DataFrame:
    """(doc_id, pos) — start positions where the phrase occurs.

    ``max_gap=0``: exact adjacency — n-1 keyed equi-joins on
    (doc_id, pos − i); the first (ideally rarest) term's list anchors
    the chain, and each start has at most one chain.

    ``max_gap>0``: ordered proximity ("near" operator) — each next term
    must appear AFTER the previous one within ``1 + max_gap`` tokens.
    The chain join becomes an equi-join on doc_id with a position-range
    condition; intermediates are bounded by the per-doc position-list
    products of the phrase terms (tiny — a doc's tf for each term), and
    the result deduplicates to distinct START positions so counts stay
    combinatorial-blowup-free ("how many places does the phrase start",
    not "how many chains").
    """
    if not phrase_terms:
        raise ValueError("empty phrase")
    pruned = pos_index.where(F.col("term").isin(list(set(phrase_terms))))
    if max_gap == 0:
        occ = (
            pruned.where(F.col("term") == phrase_terms[0])
            .select("doc_id", "pos")
        )
        for i, t in enumerate(phrase_terms[1:], start=1):
            nxt = pruned.where(F.col("term") == t).select(
                "doc_id", (F.col("pos") - i).alias("pos")
            )
            occ = occ.join(nxt, ["doc_id", "pos"])
        return occ
    chains = (
        pruned.where(F.col("term") == phrase_terms[0])
        .select("doc_id", "pos", F.col("pos").alias("_prev"))
    )
    for t in phrase_terms[1:]:
        nxt = pruned.where(F.col("term") == t).select(
            "doc_id", F.col("pos").alias("_nxt")
        )
        chains = (
            chains.join(nxt, "doc_id")
            .where(
                (F.col("_nxt") > F.col("_prev"))
                & (F.col("_nxt") <= F.col("_prev") + 1 + max_gap)
            )
            .select("doc_id", "pos", F.col("_nxt").alias("_prev"))
        )
    return chains.select("doc_id", "pos").distinct()


def phrase_topk(
    pos_index: DataFrame,
    phrases: dict[int, list[str]],
    k: int = 10,
    *,
    max_gap: int = 0,
) -> DataFrame:
    """(qid, doc_id, phrase_tf, rank) — top-k docs per quoted phrase,
    ranked by occurrence count desc then doc_id asc. ``phrases``:
    qid → normalized token list. ``max_gap`` > 0 = proximity mode."""
    if not phrases:
        raise ValueError("empty phrases")
    outs = []
    for qid, terms in sorted(phrases.items()):
        occ = phrase_occurrences(pos_index, terms, max_gap=max_gap)
        outs.append(
            occ.groupBy("doc_id").agg(F.count("*").alias("phrase_tf"))
            .withColumn("qid", F.lit(qid).cast("long"))
        )
    all_occ = outs[0]
    for o in outs[1:]:
        all_occ = all_occ.unionByName(o)
    w = Window.partitionBy("qid").orderBy(
        F.desc("phrase_tf"), F.asc("doc_id")
    )
    return (
        all_occ.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", "phrase_tf", "rank")
    )


def save_positional_index(
    docs: DataFrame,
    path: str,
    *,
    partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    serving_path: str | None = None,
) -> None:
    """Persist the positional table repartitioned by term and sorted
    within partitions by (term, doc_id, pos) — the same layout rule as
    the postings table, so a phrase query's per-term position fetch is a
    term-IN-pushed scan of a few sorted row groups (parquet min/max
    stats prune on term), not a corpus pass. ``partitions`` is the
    layout constant, sized for the target corpus like the serving
    build's shuffle width.

    ``serving_path``: the serving index built from the SAME corpus —
    stamps the artifact with that index's generation so load-time
    freshness checks catch a positional index that missed later delta
    merges (indexing/secondary.py's lifecycle contract)."""
    (
        positional_index(docs, id_col=id_col, text_col=text_col)
        .repartition(partitions, "term")
        .sortWithinPartitions("term", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(path)
    )
    if serving_path is not None:
        from ..indexing.secondary import stamp_secondary

        stamp_secondary(path, serving_path, "positional")


def load_positional_index(
    spark, path: str, *, serving_path: str | None = None
) -> DataFrame:
    """Read the persisted positional table. With ``serving_path``, first
    verify the artifact is at the serving index's CURRENT generation —
    raises StaleSecondaryIndexError (loudly, with remedies) if a delta
    merge has advanced the index past this artifact."""
    if serving_path is not None:
        from ..indexing.secondary import check_secondary

        check_secondary(path, serving_path)
    return spark.read.parquet(path)
