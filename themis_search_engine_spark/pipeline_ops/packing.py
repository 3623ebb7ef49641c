"""Sequence packing: concatenate-and-chunk layout for LLM pretraining.

Pretraining batches are fixed-length token sequences; the standard layout
concatenates documents in a deterministic order and cuts every ``budget``
tokens (docs may span sequence boundaries — the GPT-style packing rule,
not bin packing). The operator computes, for every doc, its global token
offset in that concatenation and the sequence its first token lands in:

  n_tokens(d)  = |normalized nonempty tokens|   (RAW count — packing
                 counts real tokens, so no stopword removal)
  start_pos(d) = Σ n_tokens(d') for d' < d      (exclusive prefix sum
                 in doc_id order)
  seq_id(d)    = floor(start_pos / budget)
  end_seq(d)   = floor((start_pos + n_tokens - 1) / budget)  (last
                 sequence the doc touches; > seq_id ⇢ boundary-spanning)

Scale shape — the distributed prefix sum: a global window over doc_id
would serialize the corpus through one task. Instead doc_ids are bucketed
by an explicit, deterministic range rule (``bucket = doc_id div
bucket_size`` — order-preserving across buckets), the cumulative sum runs
per-bucket in parallel, and the exclusive cross-bucket offsets come from
a window over the per-bucket TOTALS frame — #buckets rows, thousands at
100 TB, trivially one task — broadcast-joined back. Two linear shuffles,
no collect, no UDF.

``stats=True`` rolls the layout up per sequence (fill count comes from
doc-boundary arithmetic, not a token explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_counts_raw(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens) — size of the normalized nonempty token stream
    (P2 normalize → split; NO stopword filter: packing counts the tokens
    the model will actually see)."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", " ")),
            r"\s+",
        ),
        lambda t: t != F.lit(""),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).cast("long").alias("n_tokens")
    )


def pack_sequences(
    token_counts: DataFrame,
    *,
    budget: int = 2048,
    bucket_size: int = 65_536,
    cache: bool = True,
) -> DataFrame:
    """(doc_id, n_tokens, start_pos, seq_id, end_seq) — deterministic
    concatenate-and-chunk packing in doc_id order.

    ``bucket_size`` controls prefix-sum parallelism: each bucket of
    doc_ids cumulates independently; only the #buckets-row totals frame
    passes through a single-task window. Results are bucket-invariant —
    any bucket_size yields the identical packing.

    ``cache``: the counts feed both the per-bucket cumsum and the bucket
    totals — uncached, an upstream tokenization (token_counts_raw) would
    run twice per action. Caller owns the cache lifecycle (see
    bm25f_score_all)."""
    b = token_counts.withColumn(
        "_bkt", (F.col("doc_id") / F.lit(int(bucket_size))).cast("long")
    )
    if cache:
        b = b.cache()
    in_bucket = Window.partitionBy("_bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = b.withColumn(
        "_lcum", F.sum("n_tokens").over(in_bucket) - F.col("n_tokens")
    )
    totals = b.groupBy("_bkt").agg(F.sum("n_tokens").alias("_tot"))
    off_w = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "_off", F.sum("_tot").over(off_w) - F.col("_tot")
    ).select("_bkt", "_off")
    start = F.col("_lcum") + F.col("_off")
    last_tok = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .select(
            "doc_id",
            "n_tokens",
            start.cast("long").alias("start_pos"),
            F.floor(start / F.lit(int(budget))).cast("long").alias("seq_id"),
            F.floor(last_tok / F.lit(int(budget))).cast("long").alias("end_seq"),
        )
    )


def packed_stats(packed: DataFrame, *, budget: int = 2048) -> DataFrame:
    """(seq_id, n_docs_starting, tokens_starting) — per-sequence layout
    rollup over the packing table: how many docs BEGIN in each sequence
    and how many of their tokens there are in total (boundary-spanning
    docs attribute all tokens to their start sequence; a map-side
    combinable single groupBy)."""
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_starting"),
        F.sum("n_tokens").cast("long").alias("tokens_starting"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    size: int = 32,
    stride: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — per-document sliding
    token windows: the RAG / embedding chunking primitive (pack_sequences
    is the concatenate-across-docs pretraining layout; this is its
    within-document sibling, where overlap preserves context across
    chunk boundaries).

    Windows start at 0, stride, 2·stride, … while start < n_tokens (so
    chunk_id = start/stride); the tail window may be shorter than
    ``size``; empty docs emit no chunks. Tokens are the P2-normalized
    whitespace stream (stopwords KEPT — chunks feed embedding models,
    which want full context, not the retrieval token stream).

    Plan: pure in-row Column arithmetic — the token array is STAGED as a
    column once (re-inlining it per window start re-runs the tokenizer
    ~n/stride times), then explode(sequence) + slice + array_join, all
    codegen; no shuffle, scan-speed. ``sequence`` is guarded by the
    n > 0 filter (Spark's sequence(0, -x) would DESCEND).
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    from .dedup import _tok_array

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _tok_array(F.col(text_col)).alias("_toks"),
    ).where(F.size("_toks") > 0)
    last = (
        ((F.size("_toks") - 1) / F.lit(stride)).cast("int") * F.lit(stride)
    )
    out = staged.select(
        "doc_id",
        "_toks",
        F.explode(
            F.sequence(F.lit(0), last, F.lit(stride))
        ).alias("_start"),
    ).select(
        "doc_id",
        (F.col("_start") / F.lit(stride)).cast("long").alias("chunk_id"),
        F.slice(F.col("_toks"), F.col("_start") + 1, size).alias("_w"),
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.size("_w").cast("long").alias("n_tokens"),
        F.array_join("_w", " ").alias("chunk_text"),
    )
