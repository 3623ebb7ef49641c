"""Subword-tokenizer training primitives (BPE) at corpus scale.

A training-data pipeline that feeds an LLM needs a tokenizer, and
training one (Sennrich et al. 2016 byte-pair encoding; the GPT-2/
SentencePiece-BPE family) over a 100 TB corpus decomposes into exactly
two cost classes:

1. **word_counts** — the ONLY corpus-scale stage: one normalize/split
   pass and one (word -> freq) shuffle, map-side combinable. 10^12 docs
   reduce to a vocabulary table of ~10^7-10^8 distinct words.
2. **the merge loop** — every subsequent pair count and merge runs over
   that vocabulary table, weighted by ``freq``; its cost is independent
   of corpus size. This is the classic trick that makes BPE trainable
   at all: the corpus is never touched again after step 1.

The registered/oracled query (``bpe_pairs``) is the loop's first
iteration — adjacent character-pair frequencies — which is fully
SQL-expressible; the iterative ``bpe_train`` loop and the ``bpe_encode``
applier are pinned against a pure-Python reference implementation in
tests/test_tokenizer.py (argmax ties break deterministically on the
pair's lexicographic order, so training is reproducible run-to-run and
engine-to-engine).

Design notes:

* Words are the POST-NORMALIZATION token stream WITHOUT stopword
  removal — a tokenizer must see function words (they are the most
  frequent merges); stopword filtering is an IR-index concern (P4),
  not a tokenizer one.
* ``END`` ("</w>") marks word boundaries as its own initial symbol, the
  standard Sennrich formulation, so merges can capture suffixes.
* The per-iteration pair count is a DataFrame aggregation over in-row
  adjacent pairs (transform over a sequence — codegen, no Python); only
  the argmax row is collected (one scalar per iteration).
* The merge rewrite is a vocabulary-sized Arrow-batched pandas UDF —
  per-word Python is unavoidable for in-array adjacent-pair collapse,
  and the input is the vocab table, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..textproc import normalize_expr

END = "</w>"


def word_counts(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq) over the normalized, stopword-KEPT token stream —
    the one corpus-scale pass of tokenizer training."""
    return (
        docs.select(
            F.explode(
                F.split(normalize_expr(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _adjacent_pairs(syms_col: str):
    """In-row adjacent symbol pairs of an array column: codegen'd
    transform over a 1..n-1 sequence, no Python."""
    s = F.col(syms_col)
    # same descending-sequence guard as char_pair_counts: a fully-merged
    # word has ONE symbol and must contribute no pairs
    return F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(s, i), F.element_at(s, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_pair_counts(words: DataFrame) -> DataFrame:
    """First-iteration BPE pair statistics: adjacent CHARACTER pairs of
    each word, weighted by word frequency. (pair, cnt); pure Column
    arithmetic — substr over a sequence, explode, one combinable
    groupBy over a pair-vocabulary-sized key space."""
    # guard: sequence(1, 0) is DESCENDING in Spark, so a 1-char word
    # would fabricate pairs — emit an empty array for it instead
    pair_arr = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = words.select("freq", F.explode(pair_arr).alias("pair"))
    return pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))


def _init_syms(words: DataFrame) -> DataFrame:
    """(word, syms, freq) with syms = [c1, c2, ..., cn, END] — the
    standard initial symbol sequence."""
    chars = F.filter(F.split("word", ""), lambda c: c != "")
    return words.select(
        "word",
        F.concat(chars, F.array(F.lit(END))).alias("syms"),
        "freq",
    )


def _merge_pair_udf(a: str, b: str):
    """Collapse every adjacent (a, b) into a+b inside a symbol array —
    vocabulary-sized Arrow batches, left-to-right non-overlapping (the
    reference BPE semantics)."""
    merged = a + b

    @F.pandas_udf(ArrayType(StringType()))
    def _merge(syms):  # pd.Series of lists
        def one(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return _merge


def bpe_train(
    words: DataFrame, n_merges: int, *, min_cnt: int = 1
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a (word, freq) table.

    Each iteration: one vocabulary-sized aggregation (pair counts,
    in-row pair construction, map-side combinable) of which only the
    argmax row is collected, then one vocabulary-sized merge rewrite.
    Deterministic: argmax ties break on pair lexicographic order. Stops
    early when no pair reaches ``min_cnt``.
    """
    state = _init_syms(words).cache()
    state.count()  # materialize once; each iteration rewrites lineage
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                state.select("freq", F.explode(_adjacent_pairs("syms")).alias("p"))
                .groupBy("p")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("p"))
                .first()
            )
            if top is None or top["cnt"] < min_cnt:
                break
            a, b = top["p"].split(" ", 1)
            merges.append((a, b))
            nxt = state.select(
                "word", _merge_pair_udf(a, b)("syms").alias("syms"), "freq"
            ).cache()
            nxt.count()
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return merges


def bpe_encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python BPE applier (merges in learned order) — the reference
    semantics bpe_encode vectorizes; also the pytest twin."""
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    words: DataFrame, merges: list[tuple[str, str]], *, word_col: str = "word"
) -> DataFrame:
    """word -> subword tokens under a learned merge list: one
    Arrow-batched pandas UDF, merge list closed over (broadcast with the
    task). Input is whatever word-shaped frame the caller has — encoding
    a corpus means encoding its distinct-word table then joining back,
    never re-running Python per occurrence."""
    ms = list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _enc(w):
        return w.map(lambda x: bpe_encode_py(x, ms))

    return words.withColumn("tokens", _enc(F.col(word_col)))
