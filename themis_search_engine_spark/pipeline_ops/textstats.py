"""Text analysis operators: token stats, language-ID, quality, fingerprints.

Everything is native Column expressions — no Python in the hot path, and
each operator has an exact DuckDB-SQL twin (oracle_sql.py). These are the
per-document map-side operators of a training-data pipeline: they shuffle
nothing (narrow projections), so at 100 TB they run at scan speed and
their outputs feed the filter/bucket decisions downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..stopwords import STOPWORDS
from .dedup import _tok_array, shingles

_ASCII_STOPS = sorted(w for w in STOPWORDS if w.isascii())

# tiny per-language marker lexicons for the n-gram/stopword-hit heuristic;
# chosen to be disjoint across languages (deterministic arithmetic, no
# model). 'en' additionally wins as the fallback for Latin-script text.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "por", "para", "con", "del"],
}


# BPE-ish pre-tokenization (RE2-safe, no lookahead — portable to the
# DuckDB oracle): letter runs, single digits, runs of other non-space.
# Approximates how byte-pair pre-tokenizers segment before merges; the
# unit count is the budget-estimation signal for training pipelines.
BPE_UNIT_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+"


def token_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_distinct, mean_token_len, n_subwords).

    Whitespace tokenization after P2 normalization; distinct count via
    array_distinct (in-row, no shuffle — NOT a groupBy count-distinct);
    n_subwords = BPE-ish pre-token unit count over the RAW text.
    """
    toks = _tok_array(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.round(
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0).cast("long"),
                               lambda acc, t: acc + F.length(t))
                   / F.size(toks)).otherwise(F.lit(0.0)),
            6,
        ).alias("mean_token_len"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT_RE), 0))
        .cast("long").alias("n_subwords"),
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_id(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pred_lang, marker_hits) — stopword-marker language ID.

    Deterministic argmax over per-language marker-hit counts; ties and
    zero-hit docs fall back to 'und'. CJK content short-circuits to 'zh'
    via a codepoint-class test on the RAW text (P2 would erase it).
    """
    toks = _tok_array(F.col(text_col))
    hit_cols = {
        lang: _marker_hits(toks, words) for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hit_cols[la] for la in langs])
    pred = F.lit("und")
    # reversed so that earlier languages win ties (first-match semantics)
    for la in reversed(langs):
        pred = F.when(hit_cols[la] == best, F.lit(la)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    has_cjk = F.col(text_col).rlike(r"[一-鿿]")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(has_cjk, F.lit("zh")).otherwise(pred).alias("pred_lang"),
        best.cast("long").alias("marker_hits"),
    )


def quality_score(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, alpha_ratio, stop_ratio, len_score, quality).

    Gopher/C4-style heuristic signals, arithmetic only:
      alpha_ratio = alnum chars / chars          (symbol soup ↓)
      stop_ratio  = stopword tokens / tokens     (natural prose ↑)
      len_score   = min(n_tokens, 256)/256       (tiny docs ↓)
      quality     = 0.4·alpha + 0.4·min(stop·4, 1) + 0.2·len
    """
    toks = _tok_array(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_ASCII_STOPS)))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok, F.lit(256)) / F.lit(256.0)
    quality = (
        0.4 * alpha_ratio + 0.4 * F.least(stop_ratio * 4, F.lit(1.0))
        + 0.2 * len_score
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(len_score, 6).alias("len_score"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprints(
    docs: DataFrame,
    n: int = 3,
    k: int = 4,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fingerprint, sketch) — content fingerprinting.

    fingerprint = min md5 over word n-gram shingles (winnowing-lite: the
    global min of the rolling window hashes); sketch = the k smallest
    shingle hashes as a sorted array (a bottom-k set sketch — its overlap
    estimates Jaccard, and equal sketches ⇒ near-identical content).
    Map-side-combinable aggregates only.
    """
    sh = shingles(docs, n, text_col=text_col, id_col=id_col)
    hashed = sh.select("doc_id", F.md5("shingle").alias("h"))
    return (
        hashed.groupBy("doc_id")
        .agg(
            F.min("h").alias("fingerprint"),
            F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("sketch"),
        )
    )


def _bigram_stream(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, w1, w2) per adjacent token pair — extracted INSIDE the
    row via array slicing + zip (no positional shuffle, no window): the
    whole expansion happens in whole-stage codegen before the first
    exchange."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", " ")),
            r"\s+",
        ),
        lambda t: t != F.lit(""),
    )
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("_bg")
    ).select("doc_id", F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def doc_lm_score(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, cross_entropy) — per-doc average bigram
    cross-entropy under the corpus's own MLE bigram model (the
    perplexity-filter primitive: CCNet/Gopher-style quality scoring
    without an external LM; docs whose word transitions are atypical for
    the corpus score high and can be thresholded away).

      P(w2|w1) = c(w1,w2) / c(w1,·)     (MLE; self-trained, so every
                                         scored bigram has count ≥ 1)
      cross_entropy(d) = -(1/|bigrams(d)|) Σ log2 P(w2|w1)

    Docs with < 2 tokens have no bigrams and are omitted (nothing to
    score). Scale: the bigram stream is row-local (no pre-shuffle
    blow-up beyond the token count), the model is two combinable counts,
    scoring is one co-partitioned join on (w1,w2) + a per-doc rollup —
    all linear shuffles; model terms never collect to the driver.

    ``cache``: the per-doc bigram counts feed the model derivation AND
    the scoring join — uncached, the corpus would tokenize twice per
    action. Caller owns the cache lifecycle (see bm25f_score_all)."""
    bg = _bigram_stream(docs, text_col, id_col)
    per_doc = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if cache:
        per_doc = per_doc.cache()
    model = per_doc.groupBy("w1", "w2").agg(F.sum("_n").alias("_c12"))
    ctx = model.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    return (
        per_doc.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum("_n").cast("long").alias("n_bigrams"),
            (
                -F.sum(F.col("_n") * F.log2(F.col("_c12") / F.col("_c1")))
                / F.sum("_n")
            ).alias("cross_entropy"),
        )
    )


def corpus_profile(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, total_tokens, mean_tokens, p25/p50/p90 token
    length) — the corpus-composition report a data pipeline runs before
    and after every cleaning stage.

    Exact percentiles (interpolating, the (n-1)·p rule both Spark and
    DuckDB implement): right for a per-group profile where groups are
    few and the per-group sort is the point. At 10¹² docs swap in
    percentile_approx — same plan shape, sketch-mergeable — and accept
    the documented error bound; the profile is diagnostic, not an
    oracle."""
    toks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", " ")),
            r"\s+",
        ),
        lambda t: t != F.lit(""),
    )
    base = docs.select(
        F.col(group_col).alias("grp"), F.size(toks).cast("double").alias("_n")
    )
    pct = F.percentile("_n", F.lit([0.25, 0.5, 0.9]).cast("array<double>"))
    return base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_n").cast("long").alias("total_tokens"),
        F.avg("_n").alias("mean_tokens"),
        pct[0].alias("p25_tokens"),
        pct[1].alias("p50_tokens"),
        pct[2].alias("p90_tokens"),
    )


def repetition_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, dup_bigram_frac, top_bigram_frac)
    — Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 use duplicate-n-gram fractions as the strongest low-quality /
    machine-generated-text markers; the reference engine has no quality
    filtering at all).

    Everything is in-row Column arithmetic — a narrow projection with NO
    shuffle, so at 10^12 docs it runs at scan speed beside token_stats.
    ``top_bigram_frac`` counts each distinct bigram inside the row
    (O(distinct·n) per doc); for multi-MB documents cap the token array
    with ``slice`` before the transform — web docs post-extraction are
    ~1k tokens, where this is microseconds.

    Two defenses against expression re-evaluation (Spark performs no CSE
    across lambda bodies, and predicate pushdown substitutes project
    aliases into filters, re-inlining them):
      1. the token/bigram arrays are STAGED as materialized columns in
         their own projections (CollapseProject keeps non-cheap,
         multiply-referenced aliases staged — SPARK-36718);
      2. bigrams are built with zip_with over two SLICES — the token
         array is a slice argument (evaluated once per evaluation),
         never referenced inside a per-element lambda, so even a fully
         re-inlined copy (e.g. a filter pushed through the projection by
         a downstream join) evaluates in O(n), not O(n²). The original
         transform(sequence, i -> element_at(toks, i)) form measured
         143 s for 500 tiny docs; this form is ~1 s.
    """
    toks = _tok_array(F.col(text_col))
    staged = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    )
    n = F.size(F.col("_toks"))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    staged = staged.select("doc_id", "_toks", bigrams.alias("_bgs"))
    bg = F.col("_bgs")
    nb = F.size(bg)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda b: F.size(F.filter(bg, lambda x: x == b)),
        )
    )
    return staged.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(
            F.when(n > 0, 1.0 - F.size(F.array_distinct(F.col("_toks"))) / n)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
        F.round(
            F.when(nb > 0, 1.0 - F.size(F.array_distinct(bg)) / nb)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
        F.round(
            F.when(nb > 0, top_cnt / nb).otherwise(F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


# PII patterns — kept to the Java-regex ∩ RE2 common subset so the Spark
# plan and the DuckDB oracle compile the SAME expression. Deliberately
# conservative (no lookahead/backrefs): a production scrubber swaps in a
# richer ruleset; the ENGINE shape (count + global replace in one narrow
# projection) is what's being built here.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones) — regex PII
    redaction, the mandatory pre-training scrub pass (C4 removed pages on
    a blocklist; modern pipelines redact in place to keep the prose).

    Counts are taken on the raw text, then categories are replaced in
    order email → ip → phone (email first so its host part is never
    re-matched as a bare pattern). Pure ``regexp_*`` Column expressions:
    whole-stage codegen, no shuffle, scan-speed at 10^12 docs.
    """
    t = F.col(text_col)
    cnt = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(t, F.lit(pat), 0)
    ).cast("long")
    clean = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4_RE, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        cnt(PII_EMAIL_RE).alias("n_emails"),
        cnt(PII_IPV4_RE).alias("n_ips"),
        cnt(PII_PHONE_RE).alias("n_phones"),
    )


def pii_view(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PII-bearing view of the driver's ``documents`` table
    (the test-fixture mapping, replicated bit-for-bit by the DuckDB twin
    oracle_sql_ops._PII_CTE): every third doc gets an email + IPv4 +
    phone appended, derived from doc_id — so the scrub has real work and
    exact expected counts at every scale factor."""
    d = F.col(id_col)
    injected = F.concat(
        F.col("text"),
        F.lit(" contact u"), d.cast("string"),
        F.lit("@mail"), (d % 7).cast("string"),
        F.lit(".example.com from 10."), (d % 200).cast("string"),
        F.lit("."), ((d * 7) % 250).cast("string"),
        F.lit(".4 call +1-555-"),
        F.lpad(((d * 13) % 10000).cast("string"), 4, "0"),
    )
    return docs.withColumn(
        "text", F.when(d % 3 == 0, injected).otherwise(F.col("text"))
    )


def blocklist_filter(
    docs: DataFrame,
    words: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_blocked, keep) — C4's badword stage: count blocklist
    token occurrences in the P2-normalized token stream and flag the doc
    (keep = zero hits). C4 drops any page containing a word from the
    "dirty/naughty" list; the list here is an explicit parameter (the
    real deployment ships its own), matched at TOKEN grain so "scrapbook"
    never trips a "crap" entry the way substring matching does.

    Plan: pure in-row codegen — the token array is staged once, hits are
    a filter against a literal array (broadcast-free: the list lives in
    the plan), no shuffle; composes with quality_score/repetition_stats
    in the same scan. At a 10⁵-word real blocklist swap the literal
    array for a broadcast join on token — same grain, one extra
    map-side-combinable groupBy.
    """
    if not words:
        raise ValueError("empty blocklist")
    from .dedup import _tok_array

    wl = F.array(*[F.lit(w) for w in sorted(set(words))])
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _tok_array(F.col(text_col)).alias("_toks"),
    )
    n = F.size(
        F.filter(F.col("_toks"), lambda t: F.array_contains(wl, t))
    ).cast("long")
    return staged.select(
        "doc_id",
        n.alias("n_blocked"),
        (n == 0).alias("keep"),
    )


def readability(
    docs: DataFrame,
    *,
    words_per_sentence: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_syllables, n_sentences, flesch) — Flesch
    reading-ease (Flesch 1948; the classic filter feature next to the
    Gopher gates in quality_score): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/word), 6-dp rounded.

    Syllables are the standard vowel-group heuristic — runs of [aeiouy]
    in the normalized word, floor 1 (so digit tokens count one beat).
    The corpus is single-line token streams with no sentence punctuation,
    so sentences fall back to the documented fixed-window surrogate
    ceil(words / words_per_sentence); feed punctuated text and a real
    splitter upstream to replace it. Zero-word docs drop (no 0/0 row).

    Pure in-row arithmetic over one projection — no shuffle, no UDF:
    at 100 TB this runs at scan speed like the rest of textstats.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _tok_array(F.col(text_col)).alias("_toks"),
    ).where(F.size("_toks") > 0)
    syl_of = lambda w: F.greatest(  # noqa: E731
        F.lit(1).cast("long"),
        F.size(
            F.filter(F.split(w, "[^aeiouy]+"), lambda x: x != "")
        ).cast("long"),
    )
    n_words = F.size("_toks").cast("long")
    n_syl = F.aggregate(
        F.col("_toks"), F.lit(0).cast("long"), lambda acc, w: acc + syl_of(w)
    )
    n_sent = F.ceil(n_words / F.lit(words_per_sentence)).cast("long")
    return staged.select(
        "doc_id",
        n_words.alias("n_words"),
        n_syl.alias("n_syllables"),
        n_sent.alias("n_sentences"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words / n_sent)
            - F.lit(84.6) * (n_syl / n_words),
            6,
        ).alias("flesch"),
    )
