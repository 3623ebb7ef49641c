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


# --- accent folding (webtext pre-pass in front of P2) -----------------------
#
# P2 is ASCII-only by reference semantics (Indexer.java:307-364): 'café'
# tokenizes as 'caf' + nothing. Real web text is full of Latin diacritics,
# so the analyzer family gains an optional fold-accents pre-pass (the
# Lucene ASCIIFoldingFilter idea, restricted to the common Latin-1 /
# Latin-Extended-A set). 1→1 mappings compile to ONE translate() call
# (codegen, no regex); the few 1→2 ligatures (ß æ œ) are replace() calls
# in front. Anything unmapped still falls to P2's non-alnum → space.
# The same constants feed the DuckDB oracle twin, so the map cannot drift.

_FOLD_PAIRS = [
    ("àáâãäåāą", "a"), ("èéêëěę", "e"), ("ìíîï", "i"), ("òóôõöøő", "o"),
    ("ùúûüůű", "u"), ("ýÿ", "y"), ("ñńň", "n"), ("çćč", "c"),
    ("šśş", "s"), ("žźż", "z"), ("đďð", "d"), ("łľĺ", "l"), ("ř", "r"),
    ("ťţ", "t"), ("ğ", "g"),
    ("ÀÁÂÃÄÅĀĄ", "A"), ("ÈÉÊËĚĘ", "E"), ("ÌÍÎÏ", "I"), ("ÒÓÔÕÖØŐ", "O"),
    ("ÙÚÛÜŮŰ", "U"), ("ÝŸ", "Y"), ("ÑŃŇ", "N"), ("ÇĆČ", "C"),
    ("ŠŚŞ", "S"), ("ŽŹŻ", "Z"), ("ĐĎ", "D"), ("ŁĽĹ", "L"), ("Ř", "R"),
    ("ŤŢ", "T"), ("Ğ", "G"),
]
FOLD_SRC = "".join(src for src, _ in _FOLD_PAIRS)
FOLD_DST = "".join(dst * len(src) for src, dst in _FOLD_PAIRS)
FOLD_MULTI = [("ß", "ss"), ("æ", "ae"), ("œ", "oe"), ("Æ", "AE"), ("Œ", "OE")]


def fold_accents(col: Column) -> Column:
    """Latin diacritics → ASCII as a native Column (one translate + a
    handful of ligature replaces; whole-stage codegen, no UDF, no regex).
    Compose in FRONT of :func:`normalize_expr`."""
    out = col
    for s, d in FOLD_MULTI:
        out = F.replace(out, F.lit(s), F.lit(d))
    return F.translate(out, FOLD_SRC, FOLD_DST)


def fold_accents_py(text: str) -> str:
    """Python twin of :func:`fold_accents` (for oracles and tests)."""
    for s, d in FOLD_MULTI:
        text = text.replace(s, d)
    return text.translate(str.maketrans(FOLD_SRC, FOLD_DST))


def fold_accents_sql(expr: str) -> str:
    """The same fold as ANSI SQL over ``expr`` — built from the SAME
    constants, so the DuckDB twin can never drift from the Column."""
    out = expr
    for s, d in FOLD_MULTI:
        out = f"replace({out}, '{s}', '{d}')"
    return f"translate({out}, '{FOLD_SRC}', '{FOLD_DST}')"


# --- CJK bigram analyzer (webtext lane beside fold_accents) -----------------
#
# P2 is ASCII-only (Indexer.java:307-364): every CJK character becomes a
# space and Chinese/Japanese/Korean web pages index as NOTHING. The
# standard unsegmented-text answer (Lucene's CJKAnalyzer/CJKBigramFilter)
# is overlapping character bigrams: '东京大学' → 东京, 京大, 大学 — no
# dictionary, no segmenter, recall via shared bigrams. This lane keeps
# CJK codepoints through normalization, isolates CJK runs from Latin
# text, bigrams the runs in-plan (sequence + substr — codegen, no UDF),
# and sends everything else through the reference pipeline (lower,
# non-alnum → space, stopwords). A lone CJK char emits itself (substr
# clips at the run end). Subset note: runs are bigrammed across Han /
# kana / Hangul boundaries (Lucene's default flag set does the same);
# halfwidth kana and Ext-B+ ideographs are outside the class and fall to
# P2's space. The SAME class constant feeds the Column, the Python twin
# and the DuckDB SQL builder, so the three cannot drift.

CJK_CLASS = (
    "一-鿿"   # CJK Unified Ideographs (Han)
    "぀-ゟ"   # Hiragana
    "゠-ヿ"   # Katakana (incl. ー U+30FC prolonged-sound mark)
    "가-힯"   # Hangul syllables
)
_CJK_RE = re.compile(f"[{CJK_CLASS}]+")


def cjk_segment(col: Column) -> Column:
    """lower + keep [a-z0-9 + CJK] + isolate CJK runs with spaces — the
    analyzer's P2 replacement, one codegen projection."""
    low = F.lower(col)
    kept = F.regexp_replace(low, f"[^a-z0-9{CJK_CLASS}]", " ")
    return F.regexp_replace(kept, f"([{CJK_CLASS}]+)", " $1 ")


def cjk_term_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, cnt) under the CJK bigram analyzer. All narrow
    codegen until the final (doc_id, term) groupBy — same shuffle shape
    as the ASCII pipeline's A1."""
    tok = F.col("tk")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(tok) - 1, F.lit(1))),
        lambda i: tok.substr(i, F.lit(2)),
    )
    latin = F.when(
        tok.isin(*sorted(STOPWORDS)), F.array().cast("array<string>")
    ).otherwise(F.array(tok))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(cjk_segment(F.col(text_col)), r"\s+")
        ).alias("tk"),
    ).where(F.col("tk") != "")
    return (
        toks.select(
            "doc_id",
            F.explode(
                F.when(tok.rlike(f"^[{CJK_CLASS}]+$"), bigrams)
                .otherwise(latin)
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cjk_tokenize_py(text: str) -> list[str]:
    """Python twin of the CJK analyzer (for oracles and tests)."""
    low = re.sub(f"[^a-z0-9{CJK_CLASS}]", " ", (text or "").lower())
    out: list[str] = []
    for tk in re.sub(f"([{CJK_CLASS}]+)", r" \1 ", low).split():
        if _CJK_RE.fullmatch(tk):
            if len(tk) == 1:
                out.append(tk)
            else:
                out.extend(tk[i:i + 2] for i in range(len(tk) - 1))
        elif tk not in STOPWORDS:
            out.append(tk)
    return out


def cjk_terms_sql(source_sql: str, stop_list_sql: str) -> str:
    """The analyzer as DuckDB SQL over ``source_sql`` (doc_id, text) —
    built from the SAME class constant as the Column."""
    return rf"""tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(
    regexp_replace(regexp_replace(lower(text), '[^a-z0-9{CJK_CLASS}]', ' ', 'g'),
                   '([{CJK_CLASS}]+)', ' \1 ', 'g'), '\s+')) AS tk
  FROM {source_sql}
),
cjk_terms AS (
  SELECT doc_id, unnest(
    CASE WHEN regexp_matches(tk, '^[{CJK_CLASS}]+$')
         THEN [substr(tk, i, 2)
               for i in range(1, greatest(length(tk) - 1, 1) + 1)]
         WHEN tk <> '' AND tk NOT IN ({stop_list_sql}) THEN [tk]
         ELSE []::VARCHAR[] END) AS term
  FROM tok
)"""


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
        StructField("maxcnt", DoubleType(), False),
        StructField("length", LongType(), False),
    ]
)

_EMPTY_COUNTS = {
    "doc_id": "int64", "term": "object", "cnt": "float64",
    "maxcnt": "float64", "length": "int64",
}


def _batch_term_counts(
    pdf: pd.DataFrame, id_col: str, text_col: str, do_stem: bool
) -> pd.DataFrame:
    """Arrow/numpy kernel: per-doc (term, cnt, maxcnt, length) rows.

    Token strings never materialize as Python objects: normalization and
    splitting run as pyarrow C++ kernels, tokens are dictionary-encoded, and
    stopword/stem work happens once per *vocabulary entry* (Zipf ⇒ tiny vs
    token count). The doc×term count is an int64-key np.unique, and per-doc
    maxcnt/length come from reduceat over the grouped result — emitting them
    here removes a groupBy+join from the downstream plan entirely.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pd.DataFrame({k: pd.Series(dtype=v) for k, v in _EMPTY_COUNTS.items()})
    if len(pdf) == 0:
        return empty
    arr = pa.Array.from_pandas(pdf[text_col].fillna(""))
    norm = pc.utf8_lower(
        pc.replace_substring_regex(arr, pattern="[^a-zA-Z0-9]", replacement=" ")
    )
    # ascii_split_whitespace, NOT utf8_split_whitespace: P2 just mapped
    # every non-[a-zA-Z0-9] codepoint to an ASCII space, so the array is
    # ASCII-only and the ascii splitter is exact — and pyarrow 16.x's utf8
    # splitter mis-scans buffers shrunk by multibyte regex replacement,
    # emitting tokens with stale trailing spaces (hypothesis-found; see
    # tests/test_tokenizer_parity.py).
    toks = pc.ascii_split_whitespace(norm)
    flat = pc.list_flatten(toks)
    if len(flat) == 0:
        return empty
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = denc.dictionary.to_pylist()

    # vocabulary-level stopword filter + stem, then re-encode to stem codes.
    # The " " guard works around a pyarrow 16.x utf8_split_whitespace bug:
    # on buffers produced by replace_substring_regex over multibyte input it
    # can emit a stale space-containing token (hypothesis-found, see
    # tests/test_tokenizer_parity.py); post-P2 tokens are [a-z0-9]+ so any
    # space-bearing vocab entry is corrupt and must be dropped.
    stems: list[str] = []
    stem_code: dict[str, int] = {}
    code_map = np.empty(len(vocab), dtype=np.int64)
    for i, w in enumerate(vocab):
        if not w or " " in w or w in STOPWORDS:
            code_map[i] = -1
            continue
        s = porter_stem(w) if do_stem else w
        j = stem_code.get(s)
        if j is None:
            j = len(stems)
            stem_code[s] = j
            stems.append(s)
        code_map[i] = j
    mapped = code_map[codes]
    keep = mapped >= 0
    parent, mapped = parent[keep], mapped[keep]
    if len(parent) == 0:
        return empty

    n_stems = len(stems)
    combined = np.sort(parent * n_stems + mapped)  # quicksort ≫ np.unique
    bounds = np.nonzero(np.diff(combined))[0] + 1
    firsts = np.concatenate([[0], bounds])
    uniq = combined[firsts]
    cnt = np.diff(np.concatenate([firsts, [len(combined)]]))
    doc_idx = uniq // n_stems
    term_idx = uniq % n_stems

    # uniq is sorted ⇒ rows group contiguously by doc: reduceat per doc
    doc_first = np.concatenate([[0], np.nonzero(np.diff(doc_idx))[0] + 1])
    maxc = np.maximum.reduceat(cnt, doc_first)
    lens = np.add.reduceat(cnt, doc_first)
    inv = np.zeros(len(doc_idx), dtype=np.int64)
    inv[doc_first[1:]] = 1
    inv = np.cumsum(inv)

    doc_ids = pdf[id_col].to_numpy()[doc_idx]
    term_arr = np.asarray(stems, dtype=object)[term_idx]
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "term": term_arr,
            "cnt": cnt.astype(np.float64),
            "maxcnt": maxc[inv].astype(np.float64),
            "length": lens[inv].astype(np.int64),
        }
    )


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
