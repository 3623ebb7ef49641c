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


def infix_qterms(
    spark: SparkSession,
    dictionary: DataFrame,
    infix_queries: dict[int, str],
    *,
    max_terms: int = 16,
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
        trigram_terms(dictionary)
        # IN-list keeps the predicate pushdown explicit for the
        # persisted-artifact case (the broadcast join alone would not
        # prune the scan's row groups).
        .where(F.col("gram").isin(all_grams))
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
