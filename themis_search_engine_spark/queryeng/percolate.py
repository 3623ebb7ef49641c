"""Percolation — reverse search: match documents against stored queries.

The reference only runs the forward direction (a query batch against an
indexed corpus, Search.java:60-322). The reverse direction — thousands
of STANDING queries (alerts, saved searches, routing rules) matched
against each NEWLY ARRIVING document — is the classic percolator
surface (Elasticsearch's percolate query), and at web-crawl scale it is
a streaming-ingest stage: every crawled page fans out to the alert
queries it satisfies.

Semantics: a stored query is its post-pipeline distinct term set
(normalize -> tokenize -> stopword, the Q9 pipeline — same treatment the
forward path gives queries). A document matches under

* ``mode="all"``  — it contains EVERY term of the query (web-search
  "all words" default; a query with zero post-pipeline terms, or any
  term absent from the doc, matches nothing),
* ``mode="any"``  — it contains at least one term (Q6 existential),
* ``min_match=m`` — at least m of the query's terms.

Scale design (10^12 docs/day x 10^5 standing queries):

* The stored-query table is tiny relative to the corpus and is
  **broadcast**; the corpus side never shuffles by query. The only
  wide operation is the per-(doc, qid) match count, which is map-side
  combinable and bounded by sum over docs of |distinct doc terms ∩
  query vocabulary| — the broadcast join discards every non-query term
  at scan speed before the aggregation.
* A smarter-still plan for huge query sets (term -> query inverted
  index, i.e. percolating through an index OF the queries) degenerates
  to this same broadcast join when the query set fits one executor —
  which 10^5 queries always do. The broadcast IS the query index.
* Stateless per document: the streaming twin (streaming/percolate.py)
  runs this exact plan inside foreachBatch with no state store, so
  batch and stream agree row-for-row (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percolate(
    doc_terms: DataFrame,
    qterms: DataFrame,
    *,
    mode: str = "all",
    min_match: int | None = None,
) -> DataFrame:
    """(doc_id, qid, n_matched) for every document/stored-query match.

    ``doc_terms``: any frame with (doc_id, term) — the index's counts
    table, postings_flat, or freshly tokenized pages; duplicates are
    fine (matching is on distinct terms). ``qterms``: (qid, term) from
    the standard query pipeline (``qterms_df``).
    """
    if min_match is None and mode not in ("all", "any"):
        raise ValueError(f"percolate: unknown mode {mode!r}")
    q = F.broadcast(qterms.select("qid", "term").distinct())
    req = F.broadcast(
        qterms.select("qid", "term").distinct()
        .groupBy("qid").agg(F.countDistinct("term").alias("n_req"))
    )
    matched = (
        doc_terms.select("doc_id", "term")
        .join(q, "term")
        .groupBy("doc_id", "qid")
        .agg(F.countDistinct("term").alias("n_matched"))
    )
    if min_match is not None:
        cond = F.col("n_matched") >= min_match
    elif mode == "all":
        cond = F.col("n_matched") == F.col("n_req")
    else:  # any
        cond = F.col("n_matched") >= 1
    return (
        matched.join(req, "qid")
        .where(cond)
        .select("doc_id", "qid", "n_matched")
    )
