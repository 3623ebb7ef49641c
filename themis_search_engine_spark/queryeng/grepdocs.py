"""Doc-grain substring search (corpus grep) via a document trigram index.

`queryeng/trigram.py` answers ``*pattern*`` at the VOCABULARY grain — it
finds index terms containing the pattern, then scores them with BM25.
This module answers the other question users bring from grep/Code
Search: WHICH DOCUMENTS contain this exact substring — where the
pattern may span token boundaries ("shuffle join", "a.b(") and so can
never be served by any term-dictionary rewrite.

Same Cox/pg_trgm candidate/verify split, one grain down:

* **index**: (gram, doc_id) — distinct character trigrams of each doc's
  NORMALIZED text (P2 lowercase/alnum+space, the same text the pattern
  is normalized with). At web scale this is a build-time artifact: it
  is exactly a postings table over a 36³+Δ-term vocabulary (dense, so
  bucketed by gram like S5's postings; each doc emits ≤ |text| grams).
* **candidates**: docs containing ALL trigrams of the pattern — the
  gram IN-list prunes the scan, a broadcast (qid, gram) join + one
  all-grams-present count bounds the work by the matched gram postings.
* **verify**: exact ``contains`` against the doc text, candidates only
  — one semi-join back to the corpus, never a full-corpus LIKE scan.

The prefilter is lossless for substrings (a text containing the pattern
contains every trigram of it), so candidate+verify ≡ contains exactly —
the DuckDB twin states that with a plain LIKE over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textproc import normalize_expr
from .trigram import pattern_grams


def normalize_pattern(raw: str) -> str:
    """P2 applied to a query pattern (python twin of the doc-side
    normalization; shared with the oracle builder so they cannot
    drift): lowercase, non-alnum → space, whitespace runs collapsed."""
    return " ".join(
        "".join(c if c.isalnum() else " " for c in raw.lower()).split()
    )


def _norm_text(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # collapse whitespace runs so patterns with single spaces match the
    # tokenized reading of the text (P2 maps every non-alnum to a space)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.trim(
            F.regexp_replace(normalize_expr(F.col(text_col)), r"\s+", " ")
        ).alias("_norm"),
    )


def doc_trigrams(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(gram, doc_id) — distinct character trigrams of the normalized
    doc text (the build-time doc-grain trigram postings)."""
    staged = _norm_text(docs, id_col, text_col)
    return (
        staged.where(F.length("_norm") >= 3)
        .select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(_norm) - 2),"
                        " i -> substring(_norm, i, 3))"
                    )
                )
            ).alias("gram"),
            "doc_id",
        )
    )


def grep_docs(
    spark: SparkSession,
    docs: DataFrame,
    patterns: dict[int, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(qid, doc_id) — documents whose normalized text contains each
    query's substring (patterns are normalized with the same P2 rules,
    so case and punctuation differences never miss). Patterns must be
    >= 3 normalized chars (the trigram anchor requirement)."""
    if not patterns:
        raise ValueError("empty patterns")
    qgram_rows: list = []
    qpat_rows: list = []
    for qid, raw in sorted(patterns.items()):
        norm = normalize_pattern(raw)
        gs = pattern_grams(norm)
        qpat_rows.append((int(qid), norm, len(gs)))
        qgram_rows.extend((int(qid), g) for g in gs)
    qgrams = F.broadcast(
        spark.createDataFrame(qgram_rows, "qid long, gram string")
    )
    qpat = F.broadcast(
        spark.createDataFrame(qpat_rows, "qid long, pattern string, n_grams int")
    )
    all_grams = sorted({g for _, g in qgram_rows})
    cand = (
        doc_trigrams(docs, id_col=id_col, text_col=text_col)
        .where(F.col("gram").isin(all_grams))
        .join(qgrams, "gram")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("gram").alias("_ng"))
        .join(qpat, "qid")
        .where(F.col("_ng") == F.col("n_grams"))
        .select("qid", "doc_id", "pattern")
    )
    verified = (
        cand.join(_norm_text(docs, id_col, text_col), "doc_id")
        .where(F.col("_norm").contains(F.col("pattern")))
        .select("qid", "doc_id")
    )
    return verified
