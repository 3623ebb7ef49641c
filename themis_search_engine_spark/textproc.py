"""Text extraction / normalization / tokenization pipeline.

Reference semantics (SURVEY.md §2.2):
- P2 normalize: ``replaceAll("[^a-zA-Z0-9]", " ")`` then ``toLowerCase()``
  (Indexer.java:307-364; the second Unicode regex there is a no-op after the
  first, so non-ASCII text yields no tokens).
- P3 tokenize: split on whitespace, drop empties (Indexer.java:202-219).
- P4 stopwords: 412-word list checked on the raw lowercase token BEFORE
  stemming (StopWords.java:41-99, Indexer.java:212).
- P5 Porter stem (Stemmer.java:47-73) — optional here via ``stem=``.

Three implementations of one semantics, equality-tested in
tests/test_textproc.py:
1. :func:`tokenize_py` — plain Python, used by the pure-Python oracle scorer.
2. :func:`tokens_native` — Spark Column expressions (explode/split), fully
   Catalyst-visible; used for DuckDB-oracled queries (no stemming in this
   path unless asked — stemming forces a UDF).
3. :func:`term_counts_arrow` — ``mapInPandas`` vectorized path producing
   per-doc (term, count) WITHOUT a shuffle (within-doc counts are computed
   inside the Arrow batch, per SURVEY.md §2.3 A1). This is the 100 TB path:
   no per-row Python, pandas str ops are C-vectorized, stemming is memoized
   over the (Zipfian, hence small) batch vocabulary.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .porter import stem as porter_stem
from .stopwords import STOPWORDS

_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")
_WS = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# 1. plain-Python path (oracle)
# ---------------------------------------------------------------------------

def normalize_py(text: str) -> str:
    return _NON_ALNUM.sub(" ", text or "").lower()


def tokenize_py(text: str, *, stem: bool = True, stop: bool = True) -> list[str]:
    toks = [t for t in _WS.split(normalize_py(text)) if t]
    if stop:
        toks = [t for t in toks if t not in STOPWORDS]
    if stem:
        toks = [porter_stem(t) for t in toks]
    return toks


def term_counts_py(text: str, *, stem: bool = True) -> dict[str, int]:
    return dict(Counter(tokenize_py(text, stem=stem)))


# ---------------------------------------------------------------------------
# 2. Spark-native path (Catalyst expressions end-to-end)
# ---------------------------------------------------------------------------

def normalize_expr(col: Column) -> Column:
    """P2 as a native Column: stays inside whole-stage codegen."""
    return F.lower(F.regexp_replace(col, "[^a-zA-Z0-9]", " "))


def tokens_native(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    stop: bool = True,
) -> DataFrame:
    """(doc_id, term) rows — one per surviving token occurrence.

    explode(split(...)) is a narrow transformation: no shuffle. The stopword
    filter is a literal NOT IN over the broadcastable 412-word list, which
    Catalyst compiles to a codegen'd hash-set probe.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(normalize_expr(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    if stop:
        toks = toks.where(~F.col("term").isin(*sorted(STOPWORDS)))
    return toks


# ---------------------------------------------------------------------------
# 3. Arrow-vectorized path (the scale path)
# ---------------------------------------------------------------------------

TERM_COUNTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("cnt", DoubleType(), False),
    ]
)


def _batch_term_counts(
    pdf: pd.DataFrame, id_col: str, text_col: str, do_stem: bool
) -> pd.DataFrame:
    # vectorized normalize: C-level pandas str ops, no per-row Python
    norm = (
        pdf[text_col]
        .fillna("")
        .str.replace(_NON_ALNUM, " ", regex=True)
        .str.lower()
        .str.split()
    )
    n_tokens = norm.str.len().to_numpy()
    import numpy as np

    doc_ids = np.repeat(pdf[id_col].to_numpy(), n_tokens)
    if len(doc_ids) == 0:
        return pd.DataFrame({"doc_id": [], "term": [], "cnt": []}).astype(
            {"doc_id": "int64", "term": "object", "cnt": "float64"}
        )
    terms = pd.Series(np.concatenate([v for v in norm.to_numpy() if len(v)]))
    mask = ~terms.isin(STOPWORDS)
    doc_ids, terms = doc_ids[mask.to_numpy()], terms[mask]
    if do_stem:
        # memoized over the batch vocabulary (Zipf ⇒ tiny vs token count)
        vocab = pd.unique(terms)
        terms = terms.map({v: porter_stem(v) for v in vocab})
    out = pd.DataFrame({"doc_id": doc_ids, "term": terms.to_numpy()})
    out = out.groupby(["doc_id", "term"], sort=False).size().reset_index(name="cnt")
    out["cnt"] = out["cnt"].astype("float64")
    return out


def term_counts_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    stem: bool = True,
) -> DataFrame:
    """(doc_id, term, cnt) — per-doc term counts with ZERO shuffle.

    Docs never span partitions, so within-doc aggregation completes inside
    the Arrow batch (the reference's per-doc ``mymap`` HashMap,
    Indexer.java:202-219, becomes a batch groupby). At 100 TB this keeps the
    only shuffle in the index build the term-keyed one that follows.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_term_counts(pdf, id_col, text_col, stem)

    return df.select(id_col, text_col).mapInPandas(gen, TERM_COUNTS_SCHEMA)


def term_counts_native(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    stop: bool = True,
) -> DataFrame:
    """(doc_id, term, cnt) via pure Catalyst ops (unstemmed): the oracle-
    friendly twin of :func:`term_counts_arrow`. groupBy(doc_id, term) does
    shuffle, but map-side partial aggregation makes the exchange carry
    post-agg rows only."""
    return (
        tokens_native(df, text_col, id_col, stop=stop)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
