"""Infix (``*pattern*``) wildcard retrieval via a character-trigram index.

Substring search over the vocabulary is the one wildcard shape the
prefix (spell.prefix_qterms) and reversed-suffix (spell.suffix_qterms)
rewrites cannot serve: ``*ptimi*`` anchors neither end, so over both
the forward and the reversed term domain it is an unanchored LIKE — a
full vocabulary scan per query. The standard fix (Google Code Search
[R. Cox, "Regular Expression Matching with a Trigram Index", 2012];
PostgreSQL's pg_trgm) is a character-trigram inverted index over the
vocabulary: a term can contain the pattern only if it contains EVERY
trigram of the pattern, so

* **candidate generation** is an equi-join from the pattern's trigrams
  (a handful per query, broadcast) into the gram→term table, grouped by
  term with an all-grams-present count — work linear in the gram
  postings the query actually touches, never |V|;
* **verify** is exact ``contains(pattern)`` on candidates only — the
  lossless-prefilter + candidate-bounded-verify split this repo uses
  everywhere (LSH dedup verify, SymSpell deletion keys);
* the surviving terms feed the standard OR-scored BM25 plan with
  IN-list postings pushdown, capped df-desc / term-asc like Lucene's
  deterministic maxClauseCount rewrite.

At scale the gram→term table is a build-time artifact (one explode of
S4's dictionary sink — ≤ len(term)−2 rows per term — written bucketed/
sorted by gram so each query gram reads a few row groups); here it is
derived in-plan from the same dictionary scan. The prefilter is
complete (no false negatives) by the substring-trigram containment
property, so trigram+verify ≡ contains exactly — which is what the
DuckDB oracle twin checks with a plain LIKE.

Reference: the engine's Search loop (Search.java) has no wildcard
support of any kind; semantics target Lucene's WildcardQuery →
BooleanQuery rewrite (public behavior), restricted to the ``*infix*``
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pattern_grams(pattern: str) -> list[str]:
    """Distinct character trigrams of ``pattern``, sorted. Requires
    len(pattern) >= 3 — shorter infixes have no trigram to anchor on
    (serve those through the prefix/suffix rewrites or a df-capped
    dictionary scan)."""
    if len(pattern) < 3:
        raise ValueError(f"infix pattern needs >= 3 chars: {pattern!r}")
    return sorted({pattern[i : i + 3] for i in range(len(pattern) - 2)})


def trigram_terms(dictionary: DataFrame) -> DataFrame:
    """(gram, term, df) — distinct character trigrams of each dictionary
    term (terms shorter than 3 chars emit nothing; no pattern can match
    inside them anyway). At 10⁸-term web vocabulary this is the
    build-time gram→term artifact: ~|V|·(avg_len−2) rows, bucketed and
    sorted by gram so a query's gram IN-list prunes to a few row groups.
    """
    return (
        dictionary.select("term", "df")
        .where(F.length("term") >= 3)
        .select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(term) - 2),"
                        " i -> substring(term, i, 3))"
                    )
                )
            ).alias("gram"),
            "term",
            "df",
        )
    )


def gram_candidates(
    dictionary: DataFrame,
    all_grams: list[str],
    gram_table: DataFrame | None = None,
) -> DataFrame:
    """(gram, term, df) rows for the query grams — from the live
    dictionary (derived in-plan) or a PERSISTED (gram, term) artifact
    (:func:`save_trigram_terms`). The persisted table deliberately
    carries NO df: df is joined from the live dictionary on the (tiny)
    candidate set, so delta merges that only change term statistics can
    never stale the artifact — it changes only when the TERM SET does,
    and then by an exact O(new-terms) append
    (:func:`merge_trigram_terms_delta`). Terms that left the dictionary
    (compaction after deletes) drop at this inner join."""
    if gram_table is None:
        return trigram_terms(dictionary).where(
            F.col("gram").isin(all_grams)
        )
    return (
        gram_table.select("gram", "term")
        # IN-list → parquet row-group pruning on the gram-sorted artifact
        .where(F.col("gram").isin(all_grams))
        .join(dictionary.select("term", "df"), "term")
    )


def save_trigram_terms(
    dictionary: DataFrame,
    path: str,
    *,
    serving_path: str | None = None,
    partitions: int = 16,
) -> None:
    """Persist the gram→term artifact: (gram, term) repartitioned and
    sorted by gram, so a query's gram IN-list prunes to a few row groups
    instead of re-deriving ~|V|·(avg_len−2) explode rows per query (a
    full dictionary pass per query at a 10⁸-term web vocabulary).
    ``serving_path`` stamps the artifact with the serving index's
    generation (indexing.secondary) so staleness is LOUD."""
    (
        trigram_terms(dictionary)
        .select("gram", "term")
        .repartition(partitions, "gram")
        .sortWithinPartitions("gram", "term")
        .write.mode("overwrite")
        .parquet(path)
    )
    if serving_path is not None:
        from ..indexing.secondary import stamp_secondary

        stamp_secondary(path, serving_path, "trigram_terms")


def load_trigram_terms(
    spark: SparkSession,
    path: str,
    *,
    serving_path: str | None = None,
    allow_unstamped: bool = False,
) -> DataFrame:
    """Reload a persisted gram→term artifact; with ``serving_path``,
    raise StaleSecondaryIndexError unless its stamped generation matches
    the serving index's current one."""
    if serving_path is not None:
        from ..indexing.secondary import check_secondary

        check_secondary(path, serving_path, allow_unstamped=allow_unstamped)
    return spark.read.parquet(path)


def merge_trigram_terms_delta(
    spark: SparkSession,
    path: str,
    new_terms: DataFrame,
    *,
    serving_path: str | None = None,
    partitions: int = 4,
) -> None:
    """Append the grams of terms NEW to the dictionary — O(new terms),
    the same generation-prefixed part-file append as
    merge_positional_delta. Exact: the artifact stores no statistics
    (see :func:`gram_candidates`), so existing terms whose df changed
    need no touch, and a full rebuild equals the append row-for-row
    (pinned in tests/test_secondary.py). ``new_terms``: any frame with a
    ``term`` column holding the delta dictionary's NEW terms."""
    import os
    import shutil
    import uuid

    src = new_terms.select("term").distinct().withColumn(
        "df", F.lit(0).cast("long")
    )
    tmp = f"{path}.delta-{uuid.uuid4().hex[:8]}"
    (
        trigram_terms(src)
        .select("gram", "term")
        .repartition(partitions, "gram")
        .sortWithinPartitions("gram", "term")
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

        stamp_secondary(path, serving_path, "trigram_terms")


def infix_qterms(
    spark: SparkSession,
    dictionary: DataFrame,
    infix_queries: dict[int, str],
    *,
    max_terms: int = 16,
    gram_table: DataFrame | None = None,
) -> DataFrame:
    """(qid, term, qweight=1.0) — each ``*pattern*`` query expands to
    the at-most-``max_terms`` highest-df dictionary terms CONTAINING the
    pattern (df desc, term asc — the deterministic maxClauseCount cap),
    via trigram candidate generation + contains verify. Output feeds the
    standard OR-scored BM25 plan exactly like prefix/suffix_qterms.

    Plan shape: the query side (a handful of (qid, gram) rows and the
    (qid, pattern) map) broadcasts; the gram→term side is one filtered
    scan (``gram IN (...)`` pushes down on the build-time artifact);
    the only shuffle is the per-(qid, term) gram count, keyed by
    candidate terms — bounded by the matched gram postings, never |V|.
    """
    if not infix_queries:
        raise ValueError("empty infix_queries")
    qgram_rows = []
    qpat_rows = []
    for qid, pat in sorted(infix_queries.items()):
        gs = pattern_grams(pat)
        qpat_rows.append((int(qid), pat, len(gs)))
        qgram_rows.extend((int(qid), g) for g in gs)
    qgrams = F.broadcast(
        spark.createDataFrame(qgram_rows, "qid long, gram string")
    )
    qpat = F.broadcast(
        spark.createDataFrame(qpat_rows, "qid long, pattern string, n_grams int")
    )
    all_grams = sorted({g for _, g in qgram_rows})
    cand = (
        gram_candidates(dictionary, all_grams, gram_table)
        .join(qgrams, "gram")
        .groupBy("qid", "term", "df")
        .agg(F.countDistinct("gram").alias("_ng"))
    )
    verified = (
        cand.join(qpat, "qid")
        .where(F.col("_ng") == F.col("n_grams"))
        .where(F.col("term").contains(F.col("pattern")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_terms)
        .select("qid", "term", F.lit(1.0).alias("qweight"))
    )
