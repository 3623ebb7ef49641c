"""More-like-this: retrieve documents similar to a given document.

The classic related-documents surface (Lucene's MoreLikeThis): the
source doc's most characteristic terms become a query, scored with the
standard BM25 scorer, source doc excluded. The reference has no
document-to-document retrieval at all (Search.java takes text queries
only); this composes it from existing index tables.

Term selection: top ``top_terms`` per source doc by cnt·idf (descending,
term asc tiebreak) — the tf-idf salience rule, computed from the counts
and dictionary tables (no corpus re-scan). Terms with negative
contribution still rank (idf can be negative for very common terms);
the top of the ordering is the characteristic vocabulary either way.

Scale: term selection is a per-source-doc window over that doc's own
terms (source docs are a point lookup: doc_id IN-list pushed into the
counts scan); retrieval is the standard candidate-bounded BM25 plan.
Everything downstream of the tiny (qid=doc, term) frame is identical to
text-query retrieval, so all its scale properties carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .bm25 import bm25_score_all


def mlt_query_terms(
    doc_ids: list[int],
    counts: DataFrame,
    dictionary: DataFrame,
    top_terms: int = 5,
) -> DataFrame:
    """(qid, term, qtf, qweight) — each source doc's top terms by
    cnt·idf, shaped like qterms_df output so every retrieval plan
    accepts it. qid = the source doc_id."""
    src = counts.where(F.col("doc_id").isin(list(doc_ids))).join(
        dictionary.select("term", "idf"), "term"
    )
    # rank on the ROUNDED salience (like every cross-engine ordering in
    # this repo): float-product dust must not flip near-ties between
    # engines; term asc breaks exact ties deterministically
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("cnt") * F.col("idf"), 6)), F.asc("term")
    )
    return (
        src.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= top_terms)
        .select(
            F.col("doc_id").cast("long").alias("qid"),
            "term",
            F.lit(1).alias("qtf"),
            F.lit(1.0).alias("qweight"),
        )
    )


def more_like_this(
    doc_ids: list[int],
    counts: DataFrame,
    postings_flat: DataFrame,
    dictionary: DataFrame,
    doc_stats: DataFrame,
    avgdl: float,
    *,
    top_terms: int = 5,
) -> DataFrame:
    """(qid=source doc_id, doc_id, score) — BM25 scores of all candidate
    docs for each source doc's characteristic-term query, the source
    itself excluded. Rank with the caller's top-k of choice."""
    qt = mlt_query_terms(doc_ids, counts, dictionary, top_terms)
    scored = bm25_score_all(
        qt, postings_flat, dictionary, doc_stats, avgdl,
        term_list=[r["term"] for r in qt.select("term").distinct().collect()],
    )
    return scored.where(F.col("qid") != F.col("doc_id"))


def doc_keywords(
    counts: DataFrame,
    dictionary: DataFrame,
    *,
    top_terms: int = 3,
) -> DataFrame:
    """(doc_id, term, salience, rank) — every document's most
    characteristic terms by cnt·idf (the MLT term-selection rule applied
    corpus-wide): keyword extraction for tagging, clustering labels, and
    training-data topic profiling.

    Scale: one broadcast join (dictionary) + one per-doc window — the
    window partitions by doc_id, so no key is larger than one document's
    vocabulary. Salience rounds to 6 dp before ranking (the house
    engine-independent ordering grain; ties break term asc)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("cnt") * F.col("idf"), 6)), F.asc("term")
    )
    return (
        counts.join(F.broadcast(dictionary.select("term", "idf")), "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_terms)
        .select(
            "doc_id", "term",
            F.round(F.col("cnt") * F.col("idf"), 6).alias("salience"),
            "rank",
        )
    )


def significant_terms(
    topk: DataFrame,
    counts: DataFrame,
    dictionary: DataFrame,
    n_docs: int,
    *,
    top_terms: int = 5,
    min_fg: int = 2,
) -> DataFrame:
    """(qid, term, score, rank) — Elasticsearch-style significant-terms
    aggregation over each query's RESULT SET: terms that are unusually
    frequent in the foreground (the query's top-k docs) relative to the
    background corpus. The "related searches / drill-down" surface —
    unlike doc_keywords (per-document salience) this is per-QUERY, and
    unlike query expansion it mines the result set, not the vocabulary.

    Scoring is the JLH heuristic (ES's classic default):
        score = (fgp − bgp) · (fgp / bgp)
    with fgp = fg_df / |foreground|, bgp = df / N — absolute lift times
    relative lift, so terms must be both common-in-results and rare-in-
    corpus. ``min_fg`` drops terms seen in fewer than that many
    foreground docs (the ES shard_min_doc_count analog; single-doc terms
    are noise, not signal). Rank on round(score, 6) desc, term asc — the
    house engine-independence grain.

    Scale: the foreground is |queries|·k doc ids — broadcast; the join
    against counts is therefore a broadcast semi-join on doc_id (no
    shuffle of the corpus-sized table), the per-(qid, term) aggregate is
    |fg_docs|·|their vocab| rows, and dictionary/df attaches by broadcast.
    Nothing scales with corpus size except the one counts probe.
    """
    fg = F.broadcast(topk.select("qid", "doc_id"))
    fg_size = topk.groupBy("qid").agg(F.count("*").alias("fg_n"))
    fg_df = (
        fg.join(counts.select("doc_id", "term"), "doc_id")
        .groupBy("qid", "term")
        .agg(F.count("*").alias("fg_df"))
    )
    scored = (
        fg_df.where(F.col("fg_df") >= min_fg)
        .join(F.broadcast(fg_size), "qid")
        .join(F.broadcast(dictionary.select("term", "df")), "term")
        .withColumn("fgp", F.col("fg_df") / F.col("fg_n"))
        .withColumn("bgp", F.col("df") / F.lit(float(n_docs)))
        .withColumn(
            "score",
            F.round(
                (F.col("fgp") - F.col("bgp")) * (F.col("fgp") / F.col("bgp")),
                6,
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_terms)
        .select("qid", "term", "score", "rank")
    )
