"""Spell suggestion and prefix autocomplete over the term dictionary.

The "did you mean" surface: a query term with no (or low-df) dictionary
entry gets distance-1 corrections ranked by corpus frequency; a typed
prefix gets its most frequent completions.

Scale design — the same banding + bounded-verify shape as the repo's
LSH dedup ops, because the naive form (every unknown term × every
vocabulary term through an edit-distance UDF) is a |V|-sized cross join
per term:

* **candidate generation** is a deletion-key equi-join (the SymSpell
  observation): two strings within levenshtein distance 1 share a key
  in {s} ∪ deletions1(s). The dictionary side explodes to |V| × (len+1)
  key rows — linear, computed once; at web scale it is a build-time
  table persisted bucketed by key, and the query side (a handful of
  terms) broadcast-joins into it.
* **verify** is exact `levenshtein() <= 1` on candidate pairs only —
  candidate-bounded, never corpus- or vocabulary-enumerated.
* deletion keys are length-banded by construction (a key's sources
  differ in length by ≤ 1), so no giant skewed key groups beyond what
  hot short prefixes of real vocabularies produce; df floors drop the
  misspelling tail of the dictionary itself before ranking.

Autocomplete is a dictionary range scan: `startswith(prefix)` pushes to
the parquet scan as a range predicate (string min/max row-group stats),
then a tiny per-prefix top-n window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# {term} ∪ single-character deletions of term — shared by both join sides
_DELETION_KEYS = (
    "array_union(array({c}), transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i-1), substring({c}, i+1, length({c})))))"
)


def _with_keys(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn("_key", F.explode(F.expr(_DELETION_KEYS.format(c=col))))


def spell_suggest(
    terms: DataFrame,
    dictionary: DataFrame,
    top_n: int = 3,
    *,
    min_df: int = 1,
) -> DataFrame:
    """(term, suggestion, df, rank) — distance-1 dictionary corrections
    per input term, ranked df desc then suggestion asc. The input term
    itself is excluded (an exact dictionary hit needs no correction).

    ``terms``: one column ``term`` (normalized/stemmed the same way the
    dictionary was built). ``min_df`` floors candidate suggestions — at
    web scale the dictionary's own misspelling tail is huge and a df
    floor removes it before ranking.
    """
    q = _with_keys(terms.select("term").distinct(), "term")
    d = _with_keys(
        dictionary.select(
            F.col("term").alias("suggestion"), "df"
        ).where(F.col("df") >= min_df),
        "suggestion",
    )
    cand = (
        q.join(d, "_key")
        .select("term", "suggestion", "df")
        .where(F.col("term") != F.col("suggestion"))
        .distinct()
    )
    verified = cand.where(F.levenshtein("term", "suggestion") <= 1)
    w = Window.partitionBy("term").orderBy(
        F.desc("df"), F.asc("suggestion")
    )
    return (
        verified.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select("term", "suggestion", "df", "rank")
    )


def autocomplete(
    prefixes: DataFrame,
    dictionary: DataFrame,
    top_n: int = 5,
) -> DataFrame:
    """(prefix, suggestion, df, rank) — most frequent dictionary
    completions per prefix. ``prefixes``: one column ``prefix``.

    The prefix predicate is a range condition on the sorted term domain,
    so a dictionary stored sorted/bucketed by term serves it with a
    row-group range read; the join here broadcasts the (tiny) prefix
    set and evaluates startswith codegen-side.
    """
    p = F.broadcast(prefixes.select("prefix").distinct())
    hits = dictionary.select(
        F.col("term").alias("suggestion"), "df"
    ).join(p, F.col("suggestion").startswith(F.col("prefix")))
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("suggestion"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select("prefix", "suggestion", "df", "rank")
    )


def _prefix_upper_bound(prefix: str) -> str:
    """Smallest string greater than every string with this prefix:
    increment the last character (prefixes here are normalized ASCII
    alnum, so +1 stays in range)."""
    return prefix[:-1] + chr(ord(prefix[-1]) + 1)


def autocomplete_terms(
    dictionary: DataFrame,
    prefixes: list[str],
    top_n: int = 5,
) -> DataFrame:
    """(prefix, suggestion, df, rank) — like :func:`autocomplete`, but
    with a driver-known prefix list so each prefix becomes a RANGE
    predicate on the term column: ``term >= p AND term < p⁺`` pushes
    into the parquet scan (row-group min/max pruning on the sorted term
    domain), where the join form's ``startswith`` can only filter after
    a full dictionary read. One pruned scan per prefix, unioned — the
    right plan when the dictionary is stored sorted/bucketed by term.
    """
    if not prefixes:
        raise ValueError("empty prefixes")
    legs = []
    for p in sorted(set(prefixes)):
        hi = _prefix_upper_bound(p)
        legs.append(
            dictionary.select(
                F.col("term").alias("suggestion"), "df"
            )
            .where((F.col("suggestion") >= p) & (F.col("suggestion") < hi))
            .withColumn("prefix", F.lit(p))
        )
    hits = legs[0]
    for leg in legs[1:]:
        hits = hits.unionByName(leg)
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("suggestion"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select("prefix", "suggestion", "df", "rank")
    )


def prefix_qterms(
    spark,
    dictionary: DataFrame,
    prefix_queries: dict[int, str],
    *,
    max_terms: int = 16,
) -> DataFrame:
    """(qid, term, qweight=1.0) — Lucene's PrefixQuery rewrite: each
    query prefix expands to its at-most-``max_terms`` highest-df
    dictionary completions, which then feed the standard OR-scored BM25
    plan (the reference's Search loop has no wildcard support at all;
    semantics follow Lucene's MultiTermQuery → BooleanQuery rewrite).

    Scale shape: the expansion reuses :func:`autocomplete_terms`' RANGE
    predicates (``term >= p AND term < p⁺`` pushed into the sorted
    dictionary scan — row-group pruning, never a full-vocabulary LIKE),
    and the df-desc cap is Lucene's maxClauseCount made deterministic
    (df desc, term asc), so a one-letter prefix over a 10⁸-term web
    vocabulary still emits ≤ max_terms clauses per query. The downstream
    scorer's IN-list pushdown then touches only those terms' postings.
    """
    comp = autocomplete_terms(
        dictionary, list(prefix_queries.values()), top_n=max_terms
    )
    qmap = spark.createDataFrame(
        [(int(q), p) for q, p in sorted(prefix_queries.items())],
        "qid long, prefix string",
    )
    return comp.join(F.broadcast(qmap), "prefix").select(
        "qid",
        F.col("suggestion").alias("term"),
        F.lit(1.0).alias("qweight"),
    )


def suffix_qterms(
    spark,
    dictionary: DataFrame,
    suffix_queries: dict[int, str],
    *,
    max_terms: int = 16,
) -> DataFrame:
    """(qid, term, qweight=1.0) — leading-wildcard (``*suffix``) rewrite
    via the REVERSED-term dictionary (Lucene/Solr's
    ReversedWildcardFilter): ``*er`` over the forward term domain is an
    unanchored LIKE — a full vocabulary scan — but over ``reverse(term)``
    it is the same RANGE predicate prefix expansion uses
    (``rterm >= 're' AND rterm < 'rf'``), so a sorted/bucketed reversed
    dictionary serves it with row-group min/max pruning. At scale the
    reversed dictionary is a build-time artifact (one extra column on
    S4's sink, sorted by rterm); here it is derived in-plan from the
    same dictionary scan. The df-desc / term-asc cap is Lucene's
    deterministic maxClauseCount rewrite, identical to
    :func:`prefix_qterms`; the expanded clauses then feed the standard
    OR-scored BM25 plan with IN-list postings pushdown.
    """
    if not suffix_queries:
        raise ValueError("empty suffix_queries")
    rdict = dictionary.select(
        F.reverse(F.col("term")).alias("rterm"), "term", "df"
    )
    legs = []
    for qid, s in sorted(suffix_queries.items()):
        p = s[::-1]
        hi = _prefix_upper_bound(p)
        legs.append(
            rdict.where((F.col("rterm") >= p) & (F.col("rterm") < hi))
            .select(F.lit(int(qid)).cast("long").alias("qid"), "term", "df")
        )
    hits = legs[0]
    for leg in legs[1:]:
        hits = hits.unionByName(leg)
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_terms)
        .select("qid", "term", F.lit(1.0).alias("qweight"))
    )


def correct_qterms(
    qterms: DataFrame,
    dictionary: DataFrame,
    *,
    min_df: int = 1,
) -> DataFrame:
    """(qid, term) — the did-you-mean rewrite: terms present in the
    dictionary pass through unchanged; unknown terms are replaced by
    their best distance-1 correction (df desc, suggestion asc — the
    spell_suggest rank-1 row) or kept verbatim when nothing is within
    distance 1 (they simply match no postings downstream).

    Composes in front of any retrieval plan: the output is a qterms
    frame, still query-batch-sized, so the whole rewrite is broadcast
    territory — the dictionary side is the same deletion-key equi-join
    spell_suggest uses (linear in |V|, no cross join)."""
    q = qterms.select("qid", "term").distinct()
    known = dictionary.select("term", F.lit(True).alias("_in_dict"))
    best = (
        spell_suggest(q.select("term").distinct(), dictionary, top_n=1,
                      min_df=min_df)
        .where(F.col("rank") == 1)
        .select("term", "suggestion")
    )
    return (
        q.join(known, "term", "left")
        .join(best, "term", "left")
        .select(
            "qid",
            F.when(F.col("_in_dict"), F.col("term"))
            .otherwise(F.coalesce(F.col("suggestion"), F.col("term")))
            .alias("term"),
        )
        .distinct()
    )


def fuzzy_qterms(
    spark,
    dictionary: DataFrame,
    fuzzy_queries: dict[int, str],
    *,
    max_terms: int = 16,
    min_df: int = 1,
) -> DataFrame:
    """(qid, term, qweight=1.0) — Lucene's FuzzyQuery rewrite at
    max_edits=1: each query term expands to EVERY dictionary term within
    levenshtein distance 1 (the term itself included when present —
    unlike :func:`correct_qterms`, which rewrites only unknown terms to
    a single best correction, fuzzy retrieval ORs the whole distance-1
    neighborhood), capped df desc / term asc — the deterministic
    maxClauseCount cap the other MultiTermQuery rewrites here use. The
    output feeds the standard OR-scored BM25 plan with IN-list postings
    pushdown (reference Search.java has no fuzzy matching; semantics
    follow Lucene's public FuzzyQuery → BooleanQuery rewrite).

    Scale shape — identical to :func:`spell_suggest`'s SymSpell split:
    candidate generation is the deletion-key equi-join ({s} ∪
    deletions1(s) shared key ⇔ distance ≤ 1), LINEAR in |V| on the
    dictionary side (a build-time artifact at web scale, bucketed by
    key) with the query side (a handful of terms) broadcast; verify is
    exact ``levenshtein() <= 1`` on candidates only. Never a |V| scan
    per query, never |Q|×|V|.
    """
    if not fuzzy_queries:
        raise ValueError("empty fuzzy_queries")
    qmap = spark.createDataFrame(
        [(int(q), t) for q, t in sorted(fuzzy_queries.items())],
        "qid long, qterm string",
    )
    q = _with_keys(F.broadcast(qmap), "qterm")
    d = _with_keys(
        dictionary.select("term", "df").where(F.col("df") >= min_df), "term"
    )
    cand = (
        q.join(d, "_key")
        .select("qid", "qterm", "term", "df")
        .distinct()
    )
    verified = cand.where(F.levenshtein("qterm", "term") <= 1)
    w = Window.partitionBy("qid").orderBy(F.desc("df"), F.asc("term"))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_terms)
        .select("qid", "term", F.lit(1.0).alias("qweight"))
    )


def compound_split_qterms(
    spark,
    dictionary: DataFrame,
    queries: dict[int, str],
    *,
    min_df: int = 1,
) -> DataFrame:
    """(qid, term, qweight=1.0) — compound-word splitting for unknown
    query terms (the decompounding rewrite next to did-you-mean:
    "hashjoin" → ``hash join``): a term already in the dictionary
    passes through; an unknown term tries EVERY two-way split whose
    halves are both dictionary terms and rewrites to the best one —
    ranked by the weaker half's df (``least(df_l, df_r)`` desc, left
    asc — the deterministic "both parts must be common" rule); a term
    with no valid split passes through verbatim (matching nothing
    downstream, like correct_qterms' fallback).

    Scale shape: the split enumeration is query-side only (≤ len−1
    candidate pairs per term, broadcast); the dictionary is probed by
    two equi-joins on the candidate halves — at web scale the same
    sorted term-sink point lookups every rewrite here uses. Never a
    |V| scan, no driver-side vocabulary.
    """
    if not queries:
        raise ValueError("empty queries")
    qmap = F.broadcast(
        spark.createDataFrame(
            [(int(q), t) for q, t in sorted(queries.items())],
            "qid long, qterm string",
        )
    )
    known = dictionary.select(
        F.col("term").alias("qterm"), F.lit(True).alias("_in_dict")
    )
    q = qmap.join(known, "qterm", "left")
    splits = q.where(
        F.col("_in_dict").isNull() & (F.length("qterm") >= 2)
    ).select(
        "qid", "qterm",
        F.expr(
            "explode(transform(sequence(1, length(qterm) - 1),"
            " i -> struct(substring(qterm, 1, i) AS l,"
            "            substring(qterm, i + 1, length(qterm)) AS r)))"
        ).alias("_s"),
    ).select("qid", "qterm", "_s.l", "_s.r")
    d = dictionary.select("term", "df").where(F.col("df") >= min_df)
    cand = (
        splits
        .join(d.select(F.col("term").alias("l"),
                       F.col("df").alias("_dfl")), "l")
        .join(d.select(F.col("term").alias("r"),
                       F.col("df").alias("_dfr")), "r")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.least("_dfl", "_dfr")), F.asc("l")
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("qid", "l", "r")
    )
    out = (
        q.join(best, "qid", "left")
        .select(
            "qid",
            F.when(
                F.col("_in_dict").isNotNull() | F.col("l").isNull(),
                F.array(F.col("qterm")),
            )
            .otherwise(F.array(F.col("l"), F.col("r")))
            .alias("_terms"),
        )
        .select("qid", F.explode("_terms").alias("term"))
        .distinct()
    )
    return out.select("qid", "term", F.lit(1.0).alias("qweight"))
