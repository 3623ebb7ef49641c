"""Document fetch + KWIC snippet generation for ranked hits.

The reference leaves full-document fetch unimplemented (Q10,
Search.java:88-91 prints doc ids only); a served search result needs the
classic keyword-in-context snippet. This op closes that gap Spark-first.

Position mapping: P2 normalization (``[^a-zA-Z0-9]`` → space, lower) is
character-for-character length-preserving, so the 1-based character
position of a token in the NORMALIZED text is the position of the same
characters in the ORIGINAL text — the snippet window can be cut from the
raw text using positions found in the normalized one, with no offset
bookkeeping. Token-boundary matching pads both sides with one space:
a match of ``' term '`` at padded position p starts at original char
position p.

Scale design (hits = |queries| × k rows; documents = the 100 TB corpus):

* The doc-fetch is a point lookup, not a join-the-corpus: the hit set's
  doc_ids are collected (bounded: |Q|·k, thousands at most) and planted
  into the documents scan as an IN-list — parquet row-group pruning plus
  dictionary filtering reads only pages containing hit docs, the same
  pushdown shape as the postings seek (Q2).
* hits and qterms are broadcast; the only corpus-sized thing in the plan
  is the pruned scan. No shuffle is corpus-sized.
* Snippet arithmetic (locate / substring / greatest) is pure Column
  expression — whole-stage codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# past this many hit docs, skip the literal IN-list (mirrors
# bm25.MAX_PRUNE_LITERALS) and let the broadcast join filter the scan
MAX_FETCH_LITERALS = 100_000


def fetch_docs(hits: DataFrame, documents: DataFrame) -> DataFrame:
    """Q10 doc fetch: original rows of ``documents`` for the hit set.

    Collects the (small) hit doc_id set and pushes it into the documents
    scan as an IN-list, then broadcast-joins the hits back on.
    """
    ids = [r["doc_id"] for r in hits.select("doc_id").distinct().collect()]
    pruned = documents
    if 0 < len(ids) <= MAX_FETCH_LITERALS:
        pruned = documents.where(F.col("doc_id").isin(ids))
    return pruned.join(F.broadcast(hits), "doc_id")


def kwic_snippets(
    hits: DataFrame,
    documents: DataFrame,
    qterms: DataFrame,
    *,
    before: int = 30,
    length: int = 80,
) -> DataFrame:
    """(qid, doc_id, rank, snippet) — a ``length``-char window of the
    ORIGINAL text starting ``before`` chars ahead of the first
    token-boundary occurrence of any of the qid's query terms.

    ``hits`` must carry (qid, doc_id, rank). The earliest match over the
    query's terms is deterministic (min of 1-based positions); every hit
    has one because hits come from the postings of those very terms.
    """
    fetched = fetch_docs(hits.select("qid", "doc_id", "rank"), documents)
    padded = F.concat(
        F.lit(" "),
        F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]", " ")),
        F.lit(" "),
    )
    with_terms = fetched.withColumn("padded", padded).join(
        F.broadcast(qterms.select("qid", "term").distinct()), "qid"
    )
    pos = F.expr("locate(concat(' ', term, ' '), padded)")
    first_hit = (
        with_terms.withColumn("pos", pos)
        .groupBy("qid", "doc_id")
        .agg(
            F.min(F.when(F.col("pos") > 0, F.col("pos"))).alias("mpos"),
            F.first("rank").alias("rank"),
            F.first("text").alias("text"),
        )
    )
    snippet = F.expr(
        f"substring(text, greatest(1, mpos - {before}), {length})"
    )
    return first_hit.select(
        "qid", "doc_id", "rank", snippet.alias("snippet")
    )
