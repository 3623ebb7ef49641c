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


def save_doc_trigrams(
    docs: DataFrame,
    path: str,
    *,
    serving_path: str | None = None,
    partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the doc-grain (gram, doc_id) trigram postings,
    repartitioned and sorted by gram so a query's gram IN-list prunes to
    a few row groups instead of re-normalizing + exploding the whole
    corpus per query (a full corpus pass per query at 10^12 docs).
    ``serving_path`` stamps the artifact with the serving index's
    generation (indexing.secondary) so staleness is LOUD. Per-doc rows
    carry no corpus statistics, so a delta corpus appends exactly
    (:func:`merge_doc_trigrams_delta`); DELETED docs leave stale rows
    that die at grep's live-corpus verify join — false candidates,
    never false results."""
    (
        doc_trigrams(docs, id_col=id_col, text_col=text_col)
        .repartition(partitions, "gram")
        .sortWithinPartitions("gram", "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    if serving_path is not None:
        from ..indexing.secondary import stamp_secondary

        stamp_secondary(path, serving_path, "doc_trigrams")


def load_doc_trigrams(
    spark: SparkSession,
    path: str,
    *,
    serving_path: str | None = None,
    allow_unstamped: bool = False,
) -> DataFrame:
    """Reload a persisted doc-trigram artifact; with ``serving_path``,
    raise StaleSecondaryIndexError unless its stamped generation matches
    the serving index's current one."""
    if serving_path is not None:
        from ..indexing.secondary import check_secondary

        check_secondary(path, serving_path, allow_unstamped=allow_unstamped)
    return spark.read.parquet(path)


def merge_doc_trigrams_delta(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    serving_path: str | None = None,
    partitions: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append the DELTA docs' (gram, doc_id) rows — O(delta), the same
    generation-prefixed part-file append as merge_positional_delta.
    Exact for disjoint doc_ids (the serving build's uniqueness
    precondition): per-doc gram rows carry no global state, so the
    append equals a full rebuild row-for-row (pinned in
    tests/test_secondary.py)."""
    import os
    import shutil
    import uuid

    tmp = f"{path}.delta-{uuid.uuid4().hex[:8]}"
    (
        doc_trigrams(new_docs, id_col=id_col, text_col=text_col)
        .repartition(partitions, "gram")
        .sortWithinPartitions("gram", "doc_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    prefix = f"delta-{uuid.uuid4().hex[:8]}-"
    try:
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                os.replace(f"{tmp}/{f}", f"{path}/{prefix}{f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if serving_path is not None:
        from ..indexing.secondary import stamp_secondary

        stamp_secondary(path, serving_path, "doc_trigrams")


def grep_docs(
    spark: SparkSession,
    docs: DataFrame,
    patterns: dict[int, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_table: DataFrame | None = None,
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
    gsrc = (
        doc_trigrams(docs, id_col=id_col, text_col=text_col)
        if gram_table is None
        else gram_table  # persisted artifact: gram-sorted, IN-list prunes
    )
    cand = (
        gsrc
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


def regex_grep(
    spark: SparkSession,
    docs: DataFrame,
    patterns: dict[int, str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_table: DataFrame | None = None,
) -> DataFrame:
    """(qid, doc_id) — documents whose NORMALIZED text contains a match
    of each regex (grep semantics: unanchored search, vs regex_qterms'
    full-term match). Patterns must already be written over the
    normalized alphabet ([a-z0-9 ] — P2 output), in the RE2 ∩
    java.regex subset regexsearch.parse_regex accepts.

    Same Cox split as :func:`grep_docs`, with the substring's
    all-grams-present count generalized to the regex's AND/OR trigram
    tree (regexsearch.plan_regex_grep): candidates come from the
    (gram, doc_id) index — gram IN-list pushdown, broadcast (qid, gram)
    join, tree evaluated codegen-side over each doc's matched-gram set
    — and only the candidates pay the exact rlike verify against the
    corpus text. A regex that constrains no trigram ("jo.n") falls back
    to an honest per-query full-corpus rlike scan; soundness is
    one-sided (trees degrade to True, never drop a matching doc), and
    a doc matching a gram-constrained regex necessarily has >= 3
    normalized chars, so the length floor in doc_trigrams loses
    nothing.
    """
    from .regexsearch import _tree_col, _tree_grams, plan_regex_grep

    if not patterns:
        raise ValueError("empty patterns")
    gram_trees: dict[int, object] = {}
    gram_rows: list = []
    scan_qids: list[int] = []
    pat_rows = []
    for qid, pat in sorted(patterns.items()):
        qid = int(qid)
        pat_rows.append((qid, pat))
        tree = plan_regex_grep(pat)
        if tree is True:
            scan_qids.append(qid)
        else:
            gram_trees[qid] = tree
            gram_rows.extend((qid, g) for g in sorted(_tree_grams(tree)))
    qpat = F.broadcast(
        spark.createDataFrame(pat_rows, "qid long, _pat string")
    )
    lanes: list[DataFrame] = []
    if gram_rows:
        qgrams = F.broadcast(
            spark.createDataFrame(gram_rows, "qid long, gram string")
        )
        all_grams = sorted({g for _, g in gram_rows})
        gsrc = (
            doc_trigrams(docs, id_col=id_col, text_col=text_col)
            if gram_table is None
            else gram_table  # persisted artifact: gram-sorted scan
        )
        cand = (
            gsrc
            .where(F.col("gram").isin(all_grams))
            .join(qgrams, "gram")
            .groupBy("qid", "doc_id")
            .agg(F.collect_set("gram").alias("_gs"))
        )
        tree_ok = None
        for qid, tree in sorted(gram_trees.items()):
            leg = (F.col("qid") == qid) & _tree_col(tree, "_gs")
            tree_ok = leg if tree_ok is None else (tree_ok | leg)
        lanes.append(cand.where(tree_ok).select("qid", "doc_id"))
    if scan_qids:
        sq = F.broadcast(
            spark.createDataFrame([(q,) for q in scan_qids], "qid long")
        )
        lanes.append(
            docs.select(F.col(id_col).alias("doc_id")).crossJoin(sq)
            .select("qid", "doc_id")
        )
    cand_all = lanes[0]
    for leg in lanes[1:]:
        cand_all = cand_all.unionByName(leg)
    verified = (
        cand_all.join(qpat, "qid")
        .join(_norm_text(docs, id_col, text_col), "doc_id")
        .where(F.expr("_norm rlike _pat"))
        .select("qid", "doc_id")
    )
    return verified


def grep_snippets(
    spark: SparkSession,
    docs: DataFrame,
    patterns: dict[int, str],
    *,
    before: int = 20,
    length: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(qid, doc_id, mpos, snippet) — KWIC windows for grep results: a
    ``length``-char window of the NORMALIZED text starting ``before``
    chars ahead of the first occurrence of the (normalized) pattern.
    ``mpos`` is the 1-based match position; every grep hit has one by
    construction, so the column is never null.

    Composes :func:`grep_docs`' candidate/verify plan with the same
    locate/substring Column arithmetic kwic_snippets uses — the snippet
    pass re-reads only the HIT docs' text (the verify join already
    carries it), so the extra cost over grep_docs is one codegen
    projection, not a corpus pass."""
    if not patterns:
        raise ValueError("empty patterns")
    hits = grep_docs(
        spark, docs, patterns, id_col=id_col, text_col=text_col
    )
    qpat = F.broadcast(
        spark.createDataFrame(
            [(int(q), normalize_pattern(p)) for q, p in sorted(patterns.items())],
            "qid long, pattern string",
        )
    )
    staged = (
        hits.join(qpat, "qid")
        .join(_norm_text(docs, id_col, text_col), "doc_id")
        .withColumn("mpos", F.expr("locate(pattern, _norm)").cast("long"))
    )
    snippet = F.expr(
        f"substring(_norm, greatest(1, mpos - {before}), {length})"
    )
    return staged.select("qid", "doc_id", "mpos", snippet.alias("snippet"))
