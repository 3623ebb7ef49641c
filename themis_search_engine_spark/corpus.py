"""Corpus sources: synthetic web-page generator + adapters.

The engine's primary input (BASELINE.json ``input_hint``) is an
Iceberg/parquet table of Common-Crawl-style pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
This module provides:

- :func:`synth_pages` — deterministic seed-fixed generator of that exact
  shape (FIXTURES.md §1): Zipf-sampled words from a fixed vocabulary, a head
  term in ~60% of docs (exercises skew salting), a few multibyte/Greek docs
  (pins byte-identical extraction), html wrapping text.
- :func:`extract_text` — the P1 "extraction" operator: html binary → text,
  a deterministic pure function, vectorized over Arrow batches. The per-row
  invariant vs the reference (SURVEY.md §2.2 P1) is extraction(html) == text
  byte-identically per url.
- :func:`pages_from_documents` / :func:`load_documents` — adapters for the
  driver-provided ``documents.parquet`` (doc_id, text, lang, ...) used by the
  DuckDB-oracle checks.

Generation happens distributed: a range DataFrame + vectorized mapInPandas,
so a 250k-doc bench corpus is built in parallel with no driver materialize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# fixed 5,000-word vocabulary: deterministic, pronounceable-ish, no RNG state
_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _make_vocab(n: int = 5000) -> list[str]:
    words = []
    i = 0
    while len(words) < n:
        c1 = _CONS[i % len(_CONS)]
        v1 = _VOW[(i // len(_CONS)) % len(_VOW)]
        c2 = _CONS[(i // (len(_CONS) * len(_VOW))) % len(_CONS)]
        v2 = _VOW[(i // (len(_CONS) * len(_VOW) * len(_CONS))) % len(_VOW)]
        suf = i // (len(_CONS) * len(_VOW) * len(_CONS) * len(_VOW))
        w = f"{c1}{v1}{c2}{v2}" + (f"x{suf}" if suf else "")
        words.append(w)
        i += 1
    return words


VOCAB: list[str] = _make_vocab()
# appears in ~60% of docs (Zipf head → skew exercise); must NOT be a
# stopword or it would be filtered before ever reaching the index
HEAD_TERM = "web"
GREEK_SNIPPET = "και το ελληνικό κείμενο εδώ"  # normalization drops it

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_EPOCH = pd.Timestamp("2020-01-01T00:00:00")


# topical corpora: each topic owns a disjoint slice of the vocab tail
# (slices start past the Zipf head so background text stays shared)
TOPIC_SLICE = 400
TOPIC_BASE = 800


def topic_of(i: int, topics: int) -> int:
    """Deterministic topic of synthetic doc i (md5-derived, id-order-free
    — NOT i % topics, which would correlate with doc_id%n sharding and
    contaminate the random-vs-topical comparison)."""
    h = int.from_bytes(hashlib.md5(f"topic-{i}".encode()).digest()[:4], "big")
    return h % topics


def _doc_text(i: int, rng: np.random.Generator, topics: int = 0) -> str:
    n_tok = int(rng.integers(20, 401))
    # Zipf over the fixed vocab
    ranks = rng.zipf(1.3, size=n_tok)
    ranks = np.minimum(ranks, len(VOCAB)) - 1
    toks = [VOCAB[r] for r in ranks]
    if topics:
        # ~60% of tokens redrawn uniformly from this doc's topic slice:
        # enough signal for term-vector clustering to recover the topic,
        # while the Zipf background keeps head-term skew and shared df
        t = topic_of(i, topics)
        lo = TOPIC_BASE + t * TOPIC_SLICE
        sel = rng.random(len(toks)) < 0.6
        repl = rng.integers(lo, lo + TOPIC_SLICE, size=int(sel.sum()))
        j = 0
        for pos in np.flatnonzero(sel):
            toks[pos] = VOCAB[int(repl[j])]
            j += 1
    if i % 5 != 0:  # ~60%+ of docs contain the head term
        toks.insert(int(rng.integers(0, len(toks))), HEAD_TERM)
    if i % 211 == 0:  # multibyte content docs
        toks.append(GREEK_SNIPPET)
    return " ".join(toks)


def _gen_batch(ids: np.ndarray, topics: int = 0) -> pd.DataFrame:
    rows = []
    for i in ids:
        i = int(i)
        # per-doc independent, seed derived from doc number → order-free determinism
        seed = int.from_bytes(hashlib.md5(f"page-{i}".encode()).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        text = _doc_text(i, rng, topics)
        url = f"https://example{i % 97}.org/p/{i}"
        html = f"<html><title>T{i}</title><body>{text}</body></html>".encode("utf-8")
        lang = "el" if i % 211 == 0 else ("de" if i % 101 == 0 else "en")
        rows.append((url, _EPOCH + pd.Timedelta(seconds=i), html, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_pages(
    spark: SparkSession, n_docs: int, partitions: int = 32,
    topics: int = 0,
) -> DataFrame:
    """Deterministic synthetic pages table, generated in parallel.

    ``topics`` > 0 overlays a topical mixture (each doc draws ~60% of its
    tokens from its md5-assigned topic's vocab slice) — the corpus shape
    selective-search experiments need; 0 (default) is the original
    topic-free corpus, byte-identical to previous rounds."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), topics)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )


# --- P1: extraction (html -> text), byte-identical, Arrow-vectorized -------

_EXTRACT_SCHEMA = StructType(
    [StructField("url", StringType(), False), StructField("text", StringType(), False)]
)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Deterministic pure bytes→str extraction (vectorized).

    For the synthetic corpus the body is everything between <body> and
    </body>; decoding is strict UTF-8 so the extraction is byte-exact. A real
    Common-Crawl extractor would slot in here with the same signature — the
    invariant it must satisfy is determinism per input bytes.
    """
    s = html.map(lambda b: b.decode("utf-8", errors="strict"))
    return s.str.extract(r"<body>(.*)</body>", expand=False).fillna("")


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, text) extracted from the html binary column.

    Column pruning matters at 100 TB: this selects ONLY (url, html) so the
    parquet scan never reads other columns; scoring paths never read html at
    all (SURVEY.md §4).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "text": extract_text_series(pdf["html"])}
            )

    return pages.select("url", "html").mapInPandas(gen, _EXTRACT_SCHEMA)


# --- docID assignment + adapters -------------------------------------------

def assign_doc_ids(
    pages: DataFrame, key_col: str = "url", partitions: int | None = None
) -> DataFrame:
    """Dense int64 doc_ids, deterministic by key order (SURVEY.md §7):
    required for delta+varbyte coding and range chunking.

    Scalable two-pass scheme (a single global-window row_number would pull
    the whole table into ONE partition — wrong at any scale):
      1. range-repartition + sort-within-partitions on the key (one shuffle,
         Spark samples ranges so partitions stay balanced);
      2. count rows per partition (tiny P-row collect) → cumulative offsets;
      3. per-partition sequential ids + broadcast offset, inside mapInPandas
         (the iterator is per-partition, so a running counter is exact).
    """
    parts = partitions or pages.sparkSession.sparkContext.defaultParallelism
    parted = (
        pages.repartitionByRange(parts, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    parted = parted.localCheckpoint(eager=False)  # pin partitioning for both passes
    counts = dict(
        parted.groupBy("_pid").count().collect()
    )  # {pid: rows}, at most `parts` rows
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [StructField("doc_id", LongType(), False)] + list(pages.schema.fields)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])] + seen
            seen += len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf.insert(0, "doc_id", np.arange(base, base + len(pdf), dtype="int64"))
            yield pdf

    return parted.mapInPandas(gen, out_schema)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provided oracle corpus: (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
