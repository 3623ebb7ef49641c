"""DuckDB oracle-SQL builders matching the engine's operators.

Each builder returns ANSI SQL that DuckDB runs over the driver's
pre-registered views (``documents``, ``embeddings``, ...) and that must
produce the SAME rows (column names, order-insensitive values) as the
corresponding Spark query in ``__spark_entry__.py``.

Stemming is not SQL-expressible in this sandbox (DuckDB's fts/stem
extension can't be downloaded), so stemmed variants are value-oracled a
different way: the SQL is GENERATED with the stemmed vocabulary baked in
as literal (term → stem) mapping tables computed by the same Python
stemmer the Spark side uses (see the ``*_stemmed`` builders below). Every
registered query — stemmed ones included — therefore has full oracle SQL
(rows + schema + value-hash); none fall back to the rows-only check. The
stemmer itself is additionally cross-checked in pytest against an
independently-structured twin (tests/porter_twin.py).

Floats are rounded to 6 decimals on BOTH sides; both engines use
half-away-from-zero double rounding, and sum-order differences are ~1e-13
relative, far below the rounding grain.
"""

from __future__ import annotations

from .queryeng.pipeline import parse_queries
from .stopwords import STOPWORDS

K1 = 2.0
B = 0.75
# CORI resource-selection constants (Callan et al., SIGIR'95) — must match
# queryeng.federated.CORI_DB / CORI_DK.
CORI_DB = 50.0
CORI_DK = 150.0

# Only ASCII-alnum stopwords can ever match a post-normalization token
# (P2 maps everything else to spaces), so the SQL IN-list needs only those.
_ASCII_STOPS = sorted(w for w in STOPWORDS if w.isascii())
_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in _ASCII_STOPS)

# The standard query set used by the SQL-oracled retrieval queries: mixes
# high-df terms (negative BM25 idf), a rare term (dup), unknown terms,
# an all-stopword query, and multi-term queries (FIXTURES.md §5).
QUERYSET: dict[int, str] = {
    1: "spark shuffle join",
    2: "window order group",
    3: "dup",
    4: "the a of",
    5: "fast key value vector",
    6: "batch stream merge sort query",
}

# Wider set for the evaluation-metric queries (E1-E4): ≥20 queries over
# the corpus vocabulary, mixing single/multi-term, repeated terms
# (qtf > 1), unknown terms, an all-stopword query, and phases that leave
# some queries with zero judged docs in the top-k (the reference's
# NaN-skip path, themisEval.java:280-317). Retrieval queries keep the
# small QUERYSET; only the eval harness needs breadth.
EVAL_QUERYSET: dict[int, str] = {
    1: "spark shuffle join",
    2: "window order group",
    3: "dup",
    4: "the a of",
    5: "fast key value vector",
    6: "batch stream merge sort query",
    7: "hash join",
    8: "filter scan table",
    9: "row column data",
    10: "agg group order",
    11: "customer line order",
    12: "big small slow",
    13: "spark spark spark",
    14: "merge",
    15: "stream window",
    16: "query query batch",
    17: "vector value",
    18: "key hash",
    19: "sort order",
    20: "scan filter unknownterm",
    21: "data table row column",
    22: "slow query",
    23: "fast spark stream",
    24: "group agg window sort",
}


def _qterms_values(stem: bool = False, queryset: dict[int, str] | None = None) -> str:
    rows = parse_queries(queryset or QUERYSET, stem=stem)
    vals = ", ".join(f"({qid}, '{term}', {qw!r})" for qid, term, _qtf, qw in rows)
    return f"(VALUES {vals}) AS q(qid, term, qweight)"


def _tok_head(corpus_where: str | None = None) -> str:
    """The tokenization head CTEs; ``corpus_where`` (SQL over documents'
    columns) restricts the corpus itself — every downstream statistic
    (docstat, gstats N/avgdl, dict df) then derives from the restricted
    corpus, exactly as an index built over it would compute them (the
    delete-then-compact oracle)."""
    w = f"\n  WHERE {corpus_where}" if corpus_where else ""
    return r"""
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\s+')) AS term
  FROM documents%(where)s
),
tok_f AS (
  SELECT doc_id, term FROM tok
  WHERE term <> '' AND term NOT IN (%(stops)s)
),
""" % {"stops": _STOP_LIST_SQL, "where": w}


_TOK_HEAD = _tok_head()

_COUNTS_UNSTEMMED = """counts AS (
  SELECT doc_id, term, count(*)::BIGINT AS cnt FROM tok_f GROUP BY doc_id, term
),
"""

_TOK_TAIL_TPL = """docstat AS (
  SELECT d.doc_id,
         coalesce(mx.maxcnt, 0)::BIGINT  AS maxcnt,
         coalesce(mx.length, 0)::BIGINT  AS length
  FROM documents d
  LEFT JOIN (
    SELECT doc_id, max(cnt) AS maxcnt, sum(cnt) AS length
    FROM counts GROUP BY doc_id
  ) mx USING (doc_id)%(where)s
),
gstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(length)::DOUBLE AS avgdl FROM docstat
),
dict AS (
  SELECT term, count(*)::BIGINT AS df FROM counts GROUP BY term
),
tfn AS (
  SELECT c.doc_id, c.term, c.cnt::DOUBLE / s.maxcnt AS tf
  FROM counts c JOIN docstat s USING (doc_id)
)
"""


def _tok_tail(corpus_where: str | None = None) -> str:
    w = f"\n  WHERE {corpus_where}" if corpus_where else ""
    return _TOK_TAIL_TPL % {"where": w}


_TOK_TAIL = _tok_tail()


def tok_cte(corpus_where: str | None = None) -> str:
    """TOK_CTE over a restricted corpus: the full unstemmed tokenization
    pipeline with ``corpus_where`` applied at the documents scan, so
    N/avgdl/df are those of the restricted corpus (what a build over it
    computes) — the oracle grain for delete-then-compact."""
    return _tok_head(corpus_where) + _COUNTS_UNSTEMMED + _tok_tail(corpus_where)


TOK_CTE = _TOK_HEAD + _COUNTS_UNSTEMMED + _TOK_TAIL


def _corpus_stem_map() -> list[tuple[str, str]]:
    """(term, Porter stem) for every post-stopword token in the driver's
    test corpora — the stem substitution table that makes the stemmed
    pipeline SQL-expressible (DuckDB here has no stemmer extension).

    The mapping is produced by the repo's porter.py, whose behavior is
    independently pinned by hand-verified golden vectors in
    tests/test_porter.py — including every stem in THIS corpus vocabulary
    (test_corpus_vocabulary_stems) — so a stemmer bug breaks the goldens,
    not both sides of the driver compare.
    """
    import os

    import duckdb

    from .porter import stem as porter_stem

    vocab: set[str] = set()
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        rows = con.sql(
            r"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(
                lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
                '\s+')) AS t
              FROM read_parquet('%s'))
            SELECT DISTINCT t FROM tok WHERE t <> ''
            """ % path
        ).fetchall()
        vocab |= {r[0] for r in rows}
    con.close()
    return sorted(
        (t, porter_stem(t)) for t in vocab if t not in STOPWORDS
    )


def tok_cte_stemmed() -> str:
    """TOK_CTE with P5 stemming: tokens map through the (term, stem)
    VALUES table, counts merge per (doc, stem) — the A2 stem-level merge —
    and every downstream table (docstat/dict/tfn) derives from the merged
    counts exactly as the Spark stemmed path does (textproc
    term_counts_arrow with stem=True)."""
    pairs = _corpus_stem_map()
    vals = ", ".join(f"('{t}', '{s}')" for t, s in pairs) or "('', '')"
    stem_ctes = f"""stem_map AS (
  SELECT * FROM (VALUES {vals}) v(term, stem)
),
counts AS (
  SELECT t.doc_id, coalesce(m.stem, t.term) AS term, count(*)::BIGINT AS cnt
  FROM tok_f t LEFT JOIN stem_map m USING (term)
  GROUP BY 1, 2
),
"""
    return _TOK_HEAD + stem_ctes + _TOK_TAIL


def sql_tok_counts() -> str:
    return f"WITH {TOK_CTE} SELECT doc_id, term, cnt FROM counts"


def sql_doc_lengths() -> str:
    return f"WITH {TOK_CTE} SELECT doc_id, length FROM docstat"


def sql_dictionary() -> str:
    return f"WITH {TOK_CTE} SELECT term, df FROM dict"


def sql_global_stats() -> str:
    return f"WITH {TOK_CTE} SELECT n_docs, round(avgdl, 6) AS avgdl FROM gstats"


def sql_idf_bm25() -> str:
    return (
        f"WITH {TOK_CTE} "
        "SELECT term, round(log2((n_docs - df + 0.5) / (df + 0.5)), 6) AS idf "
        "FROM dict CROSS JOIN gstats"
    )


def sql_tf_maxnorm() -> str:
    return f"WITH {TOK_CTE} SELECT doc_id, term, round(tf, 6) AS tf FROM tfn"


def _bm25_scored_cte(
    stem: bool = False,
    queryset: dict[int, str] | None = None,
    doc_filter: str | None = None,
    corpus_where: str | None = None,
) -> str:
    """``doc_filter`` (SQL over alias ``dd`` of documents) restricts the
    scored candidate set — the oracle twin of metadata.bm25_topk_filtered's
    pre-aggregation semi-join — while stats stay corpus-wide (also the
    tombstone-delete grain: Lucene's stale-stats liveDocs mask).
    ``corpus_where`` instead restricts the CORPUS (stats recomputed over
    survivors) — the delete-then-compact grain."""
    filter_join = (
        f"\n  JOIN documents dd ON t.doc_id = dd.doc_id AND ({doc_filter})"
        if doc_filter
        else ""
    )
    return f"""WITH {tok_cte_stemmed() if stem else tok_cte(corpus_where)},
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN {_qterms_values(stem, queryset)} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id{filter_join}
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
)"""


def sql_bm25_scores() -> str:
    return (
        _bm25_scored_cte()
        + " SELECT qid, doc_id, round(score, 6) AS score FROM scored"
    )


def sql_bm25_topk(k: int = 10) -> str:
    # rank on the ROUNDED score (+ doc_id tiebreak): float-sum order differs
    # across engines at ~1e-15, rounding absorbs it so ranking is engine-
    # independent and deterministic.
    return f"""{_bm25_scored_cte()},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_selective_topk(k: int = 10, m: int = 2, n_shards: int = 4) -> str:
    """Oracle twin of queryeng.federated.selective_topk: shards are
    doc_id % n_shards; CORI beliefs (T·I with b=50, k=150, shard-level
    idf on log2) from per-shard df / word counts; top-m shards per query
    by (round(belief,6) desc, shard asc); then the standard BM25 score —
    GLOBAL stats, unchanged — restricted to docs whose shard was
    selected for that query, rounded-rank top-k."""
    return f"""WITH {TOK_CTE},
shard_df AS (
  SELECT term, (doc_id % {n_shards}) AS shard, count(*)::BIGINT AS df_s
  FROM counts GROUP BY term, doc_id % {n_shards}
),
shard_cw AS (
  SELECT (doc_id % {n_shards}) AS shard, sum(length)::DOUBLE AS cw
  FROM docstat GROUP BY doc_id % {n_shards}
),
avgcw AS (SELECT avg(cw)::DOUBLE AS acw FROM shard_cw),
term_cf AS (SELECT term, count(*)::BIGINT AS cf FROM shard_df GROUP BY term),
belief AS (
  SELECT q.qid, sd.shard,
         sum( (sd.df_s / (sd.df_s + {CORI_DB!r} + {CORI_DK!r} * sc.cw / a.acw))
              * (log2(({n_shards} + 0.5) / tc.cf) / log2({n_shards} + 1.0))
         ) AS sscore
  FROM (SELECT DISTINCT qid, term FROM {_qterms_values()}) q
  JOIN shard_df sd ON q.term = sd.term
  JOIN shard_cw sc ON sd.shard = sc.shard
  JOIN term_cf tc ON q.term = tc.term
  CROSS JOIN avgcw a
  GROUP BY q.qid, sd.shard
),
sel AS (
  SELECT qid, shard FROM (
    SELECT qid, shard,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round(sscore, 6) DESC, shard ASC) AS r
    FROM belief) WHERE r <= {m}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN sel ON sel.qid = q.qid AND sel.shard = (t.doc_id % {n_shards})
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_query_difficulty() -> str:
    """Oracle twin of queryeng.qpp.query_difficulty: He & Ounis / SCQ
    pre-retrieval predictors over the query's in-vocabulary terms, from
    the same counts/dict/gstats CTEs every other unstemmed oracle uses."""
    return f"""WITH {TOK_CTE},
totc AS (SELECT sum(cnt)::DOUBLE AS c FROM counts),
cf AS (SELECT term, sum(cnt)::DOUBLE AS cf FROM counts GROUP BY term),
qv AS (SELECT DISTINCT qid, term FROM {_qterms_values()}),
idft AS (
  SELECT d.term,
         log2((g.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dict d CROSS JOIN gstats g
),
per AS (
  SELECT q.qid, i.idf,
         log2(t.c / c.cf) AS ictf,
         (1.0 + ln(c.cf)) * i.idf AS scq_t
  FROM qv q
  JOIN idft i ON q.term = i.term
  JOIN cf c ON q.term = c.term
  CROSS JOIN totc t
)
SELECT qid,
       count(*)::BIGINT AS n_terms,
       round(avg(idf), 6) AS avg_idf,
       round(max(idf), 6) AS max_idf,
       round(var_pop(idf), 6) AS var_idf,
       round(avg(ictf), 6) AS avg_ictf,
       round(sum(scq_t), 6) AS scq
FROM per GROUP BY qid"""


def sql_tiered_topk(k: int = 10, c: int = 40) -> str:
    """Oracle twin of queryeng.tiered.tiered_topk: per-term champion
    lists (top-c by rounded idf-free BM25 impact, doc_id-asc tiebreak),
    then the standard full-stats BM25 top-k restricted to tier rows."""
    return f"""WITH {TOK_CTE},
imp AS (
  SELECT t.term, t.doc_id, t.tf, s.length,
         round(t.tf * ({K1} + 1.0)
               / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)),
               6) AS impact
  FROM tfn t JOIN docstat s USING (doc_id) CROSS JOIN gstats g
),
tier AS (
  SELECT term, doc_id, tf, length FROM (
    SELECT *, row_number() OVER (PARTITION BY term
                                 ORDER BY impact DESC, doc_id ASC) AS r
    FROM imp) WHERE r <= {c}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * t.length / g.avgdl)) ) AS score
  FROM tier t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_tiered_fallback_topk(k: int = 10, c: int = 8) -> str:
    """Oracle twin of queryeng.tiered.tiered_topk_with_fallback: tier-1
    ranked results for queries the tier fills to k; the full-postings
    BM25 top-k for queries it leaves short."""
    return f"""WITH {TOK_CTE},
imp AS (
  SELECT t.term, t.doc_id, t.tf, s.length,
         round(t.tf * ({K1} + 1.0)
               / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)),
               6) AS impact
  FROM tfn t JOIN docstat s USING (doc_id) CROSS JOIN gstats g
),
tier AS (
  SELECT term, doc_id, tf, length FROM (
    SELECT *, row_number() OVER (PARTITION BY term
                                 ORDER BY impact DESC, doc_id ASC) AS r
    FROM imp) WHERE r <= {c}
),
tscored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * t.length / g.avgdl)) ) AS score
  FROM tier t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
tranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM tscored
),
fscored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
franked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM fscored
),
short AS (
  SELECT qid FROM (
    SELECT q.qid, count(t.doc_id) AS n
    FROM (SELECT DISTINCT qid FROM {_qterms_values()}) q
    LEFT JOIN (SELECT * FROM tranked WHERE rank <= {k}) t ON q.qid = t.qid
    GROUP BY q.qid
  ) WHERE n < {k}
)
SELECT qid, doc_id, score, rank::BIGINT AS rank FROM tranked
WHERE rank <= {k} AND qid NOT IN (SELECT qid FROM short)
UNION ALL
SELECT qid, doc_id, score, rank::BIGINT AS rank FROM franked
WHERE rank <= {k} AND qid IN (SELECT qid FROM short)"""


def sql_significant_terms(
    k: int = 10, top_terms: int = 5, min_fg: int = 2
) -> str:
    """Oracle twin of queryeng.mlt.significant_terms: foreground = each
    query's rounded-rank BM25 top-k, JLH = (fgp−bgp)·(fgp/bgp), min_fg
    floor, (round(score,6) desc, term asc) top-terms per query."""
    return f"""{_bm25_scored_cte()},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
fg AS (SELECT qid, doc_id FROM ranked WHERE rank <= {k}),
fgsz AS (SELECT qid, count(*) AS fg_n FROM fg GROUP BY qid),
fgdf AS (
  SELECT f.qid, c.term, count(*) AS fg_df
  FROM fg f JOIN counts c USING (doc_id)
  GROUP BY f.qid, c.term
),
sc AS (
  SELECT fd.qid, fd.term,
         round( ((fd.fg_df::DOUBLE / z.fg_n) - (d.df::DOUBLE / g.n_docs))
                * ((fd.fg_df::DOUBLE / z.fg_n)
                   / (d.df::DOUBLE / g.n_docs)), 6) AS score
  FROM fgdf fd
  JOIN fgsz z USING (qid)
  JOIN dict d USING (term)
  CROSS JOIN gstats g
  WHERE fd.fg_df >= {min_fg}
),
r2 AS (
  SELECT qid, term, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, term ASC) AS rank
  FROM sc
)
SELECT qid, term, score, rank::BIGINT AS rank
FROM r2 WHERE rank <= {top_terms}"""


def sql_bm25f_topk(
    k: int = 10,
    title_tokens: int = 8,
    w_title: float = 2.0,
    w_body: float = 1.0,
    k1: float = K1,
    b: float = B,
) -> str:
    """Oracle twin of queryeng.bm25f: positional field tag (1-based pos
    over the normalized nonempty token stream, pre-stopword) → weighted
    tf / weighted length → BM25F score, rounded-rank top-k. Field
    weights, boundary, and the every-doc-counts avgwdl rule mirror the
    Spark plan exactly."""
    return f"""WITH tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\\s+'),
           t -> t <> '') AS toks
  FROM documents
),
ftok AS (
  SELECT doc_id,
         CASE WHEN u.s.pos <= {title_tokens} THEN {w_title!r}
              ELSE {w_body!r} END AS w,
         u.s.term AS term
  FROM tokarr,
       unnest([{{'pos': i, 'term': toks[i]}}
               for i in range(1, len(toks) + 1)]) u(s)
  WHERE u.s.term NOT IN ({_STOP_LIST_SQL})
),
wtf AS (
  SELECT doc_id, term, sum(w)::DOUBLE AS wtf FROM ftok GROUP BY doc_id, term
),
wdl AS (
  SELECT d.doc_id, coalesce(x.wdl, 0.0)::DOUBLE AS wdl
  FROM documents d
  LEFT JOIN (SELECT doc_id, sum(w) AS wdl FROM ftok GROUP BY doc_id) x
  USING (doc_id)
),
gstats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(wdl)::DOUBLE AS avgwdl FROM wdl
),
dict AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ftok GROUP BY term
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.wtf * ({k1} + 1.0)
              / (t.wtf + {k1} * (1.0 - {b} + {b} * l.wdl / g.avgwdl)) ) AS score
  FROM (SELECT DISTINCT qid, term FROM {_qterms_values(stem=False)}) q
  JOIN wtf t ON q.term = t.term
  JOIN dict d ON t.term = d.term
  JOIN wdl l ON t.doc_id = l.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_topk_filtered(k: int = 10, doc_filter: str = "dd.lang = 'en'") -> str:
    """Oracle twin of metadata.bm25_topk_filtered: the restriction is
    applied inside the scored CTE (pre-aggregation), so filtered queries
    return the next-best MATCHING docs, never < k post-filtered rows."""
    return f"""{_bm25_scored_cte(doc_filter=doc_filter)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_topk_deleted(k: int = 10, kept: str = "dd.doc_id % 7 <> 0") -> str:
    """Oracle twin of registry.q_bm25_topk_deleted — Lucene liveDocs
    semantics after delete_serving_docs but BEFORE compaction: deleted
    docs are masked from candidates (pre-aggregation, like the filtered
    variant) while df/N/avgdl still reflect the FULL corpus (the stale
    statistics a tombstoned index serves until its next compaction)."""
    return f"""{_bm25_scored_cte(doc_filter=kept)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_compacted_deletes_topk(k: int = 10, kept: str = "doc_id % 7 <> 0") -> str:
    """Oracle twin of registry.q_compacted_deletes_topk — the corpus
    AFTER delete-then-compact: tombstoned docs are physically gone, so
    every statistic (N, avgdl, df, idf) is that of the surviving corpus,
    exactly a fresh build over it."""
    return f"""{_bm25_scored_cte(corpus_where=kept)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_snapshot_pinned_topk(
    k: int = 10, pinned: str = "doc_id % 4 <> 3"
) -> str:
    """Oracle twin of registry.q_snapshot_pinned_topk — the corpus AS OF
    the pinned merge-log generation (a later delta's docs invisible):
    every statistic is that of the pinned corpus, exactly a fresh build
    over it, which is the snapshot reader's whole contract."""
    return f"""{_bm25_scored_cte(corpus_where=pinned)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_fielded_topk(queries: dict[int, str], k: int = 10) -> str:
    """Oracle twin of queryeng.fielded.fielded_topk: the same
    ``field:value`` parse (shared parse_fielded, pinned by pytest)
    compiled to a per-qid CASE over the documents attributes; free text
    scores through the standard unstemmed CTE chain."""
    from .queryeng.fielded import parse_fielded

    split = {int(q): parse_fielded(s) for q, s in sorted(queries.items())}
    qs = {qid: text for qid, (text, _f) in split.items() if text}
    whens = []
    for qid, (_t, fs) in sorted(split.items()):
        if fs:
            cond = " AND ".join(
                f"lower(dd.{f}) {'<>' if neg else '='} '{v}'"
                for f, v, neg in fs
            )
            whens.append(f"WHEN {qid} THEN ({cond})")
    doc_filter = (
        "CASE q.qid " + " ".join(whens) + " ELSE TRUE END" if whens else None
    )
    return f"""{_bm25_scored_cte(queryset=qs, doc_filter=doc_filter)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_prefix_topk(
    prefix_queries: dict[int, str], max_terms: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry.q_prefix_topk — Lucene PrefixQuery rewrite:
    each prefix expands to its max_terms highest-df completions (df desc,
    term asc — the deterministic maxClauseCount cap), which then score as
    a plain OR of BM25 clauses (qweight 1)."""
    vals = ", ".join(
        f"({qid}, '{p}')" for qid, p in sorted(prefix_queries.items())
    )
    return f"""WITH {TOK_CTE},
qpref(qid, prefix) AS (VALUES {vals}),
qx AS (
  SELECT qid, term FROM (
    SELECT p.qid, d.term,
           row_number() OVER (PARTITION BY p.qid
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM dict d JOIN qpref p ON d.term LIKE p.prefix || '%'
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_suffix_topk(
    suffix_queries: dict[int, str], max_terms: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry.q_suffix_topk — leading-wildcard rewrite:
    each suffix expands to its max_terms highest-df dictionary terms
    ending with it (df desc, term asc cap, the engine's reversed-
    dictionary range scan expressed here as the semantically-equal
    unanchored LIKE), then the plain OR of BM25 clauses (qweight 1)."""
    vals = ", ".join(
        f"({qid}, '{s}')" for qid, s in sorted(suffix_queries.items())
    )
    return f"""WITH {TOK_CTE},
qsuf(qid, suffix) AS (VALUES {vals}),
qx AS (
  SELECT qid, term FROM (
    SELECT p.qid, d.term,
           row_number() OVER (PARTITION BY p.qid
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM dict d JOIN qsuf p ON d.term LIKE '%' || p.suffix
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_infix_topk(
    infix_queries: dict[int, str], max_terms: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry.q_infix_topk — infix (*pattern*) rewrite:
    each pattern expands to its max_terms highest-df dictionary terms
    CONTAINING it (df desc, term asc cap; the engine's trigram-prefilter
    + contains-verify is lossless-complete for substrings, so the plain
    unanchored LIKE here is semantically equal), then the plain OR of
    BM25 clauses (qweight 1). Terms shorter than 3 chars cannot contain
    a >=3-char pattern, so the engine's length>=3 gram filter drops
    nothing LIKE would keep."""
    vals = ", ".join(
        f"({qid}, '{p}')" for qid, p in sorted(infix_queries.items())
    )
    return f"""WITH {TOK_CTE},
qinf(qid, pat) AS (VALUES {vals}),
qx AS (
  SELECT qid, term FROM (
    SELECT p.qid, d.term,
           row_number() OVER (PARTITION BY p.qid
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM dict d JOIN qinf p ON d.term LIKE '%' || p.pat || '%'
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_fuzzy_topk(
    fuzzy_queries: dict[int, str], max_terms: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry.q_fuzzy_topk — Lucene FuzzyQuery rewrite
    at max_edits=1: each query term expands to every dictionary term
    within levenshtein distance 1 (itself included when present; the
    engine's SymSpell deletion-key prefilter is lossless-complete at
    distance 1, so the plain levenshtein join here is semantically
    equal), capped df desc / term asc, then the plain OR of BM25
    clauses (qweight 1)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, t in sorted(fuzzy_queries.items())
    )
    return f"""WITH {TOK_CTE},
qfuz(qid, qterm) AS (VALUES {vals}),
qx AS (
  SELECT qid, term FROM (
    SELECT p.qid, d.term,
           row_number() OVER (PARTITION BY p.qid
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM dict d JOIN qfuz p ON levenshtein(d.term, p.qterm) <= 1
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_regex_topk(
    regex_queries: dict[int, str], max_terms: int = 16, k: int = 10
) -> str:
    """Oracle twin of registry.q_regex_topk — full-match regex rewrite:
    each pattern expands to its max_terms highest-df matching dictionary
    terms (the engine's Cox trigram planning — exact / gram / scan lanes
    + anchored-rlike verify — is lossless over the RE2 ∩ java.regex
    subset, so the plain regexp_full_match join here is semantically
    equal), capped df desc / term asc, then the plain OR of BM25
    clauses (qweight 1)."""
    vals = ", ".join(
        f"({qid}, '{p}')" for qid, p in sorted(regex_queries.items())
    )
    return f"""WITH {TOK_CTE},
qrex(qid, pat) AS (VALUES {vals}),
qx AS (
  SELECT qid, term FROM (
    SELECT p.qid, d.term,
           row_number() OVER (PARTITION BY p.qid
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM dict d JOIN qrex p ON regexp_full_match(d.term, p.pat)
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_compound_topk(
    queries: dict[int, str], k: int = 10
) -> str:
    """Oracle twin of registry.q_compound_topk — decompounding rewrite:
    in-dictionary terms pass through; unknown terms rewrite to the best
    two-way split with both halves in the dictionary (least(df_l, df_r)
    desc, left asc), else pass through verbatim; then the plain OR of
    BM25 clauses (qweight 1)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, t in sorted(queries.items())
    )
    return f"""WITH {TOK_CTE},
q(qid, qterm) AS (VALUES {vals}),
known AS (
  SELECT q.qid, q.qterm, (d.term IS NOT NULL) AS in_dict
  FROM q LEFT JOIN dict d ON d.term = q.qterm
),
splits AS (
  SELECT qid,
         substr(qterm, 1, i::INT) AS l,
         substr(qterm, i::INT + 1, length(qterm)) AS r
  FROM (
    SELECT k.qid, k.qterm, unnest(range(1, length(k.qterm))) AS i
    FROM known k
    WHERE NOT k.in_dict AND length(k.qterm) >= 2
  )
),
cand AS (
  SELECT s.qid, s.l, s.r, least(dl.df, dr.df) AS m
  FROM splits s
  JOIN dict dl ON dl.term = s.l
  JOIN dict dr ON dr.term = s.r
),
best AS (
  SELECT qid, l, r FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY m DESC, l ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
qx AS (
  SELECT k.qid, k.qterm AS term
  FROM known k LEFT JOIN best b ON k.qid = b.qid
  WHERE k.in_dict OR b.l IS NULL
  UNION
  SELECT qid, l AS term FROM best
  UNION
  SELECT qid, r AS term FROM best
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_sdm_topk(
    queries: dict[int, list[str]],
    lambdas: tuple[float, float, float] = (0.8, 0.1, 0.1),
    window: int = 8,
    k: int = 10,
) -> str:
    """Oracle twin of registry.q_sdm_topk — sequential dependence model:
    λ_T·BM25 + λ_O·Σ log2(1+adjacent-pair count) + λ_U·Σ log2(1+pairs
    within the unordered window), positions over the normalized
    UNFILTERED token stream (the phrase oracles' tokpos), proximity legs
    LEFT-joined onto the unigram frame."""
    l_t, l_o, l_u = lambdas
    uni_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    )

    def pair_sql(qid, a, b, cond):
        return f"""SELECT {qid} AS qid, pa.doc_id, count(*)::BIGINT AS c
FROM tokpos pa JOIN tokpos pb
  ON pa.doc_id = pb.doc_id AND {cond}
WHERE pa.term = '{a}' AND pb.term = '{b}'
GROUP BY pa.doc_id"""

    pairs = [
        (qid, a, b)
        for qid, terms in sorted(queries.items())
        for a, b in zip(terms, terms[1:])
        if a != b
    ]
    po = "\nUNION ALL\n".join(
        pair_sql(q, a, b, "pb.pos = pa.pos + 1") for q, a, b in pairs
    )
    pu = "\nUNION ALL\n".join(
        pair_sql(
            q, a, b,
            f"pa.pos <> pb.pos AND abs(pb.pos - pa.pos) < {window}",
        )
        for q, a, b in pairs
    )
    return f"""WITH {TOK_CTE},
tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\\s+'),
           t -> t <> '') AS toks
  FROM documents
),
tokpos AS (
  SELECT doc_id, u.s.pos AS pos, u.s.term AS term
  FROM tokarr,
       unnest([{{'pos': i, 'term': toks[i]}}
               for i in range(1, len(toks) + 1)]) u(s)
),
qx(qid, term) AS (VALUES {uni_vals}),
uni AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS st
  FROM tfn t
  JOIN qx q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
po AS (
{po}
),
pu AS (
{pu}
),
so AS (SELECT qid, doc_id, sum(log2(c + 1.0)) AS s FROM po
       GROUP BY qid, doc_id),
su AS (SELECT qid, doc_id, sum(log2(c + 1.0)) AS s FROM pu
       GROUP BY qid, doc_id),
final AS (
  SELECT u.qid, u.doc_id,
         round({l_t} * u.st + {l_o} * coalesce(so.s, 0.0)
               + {l_u} * coalesce(su.s, 0.0), 6) AS score
  FROM uni u
  LEFT JOIN so ON u.qid = so.qid AND u.doc_id = so.doc_id
  LEFT JOIN su ON u.qid = su.qid AND u.doc_id = su.doc_id
),
ranked AS (
  SELECT qid::BIGINT AS qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM final
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_ql_topk(
    queries: dict[int, list[str]], mu: float = 2000.0, k: int = 10
) -> str:
    """Oracle twin of registry.q_ql_topk — Dirichlet query likelihood
    via the sparse decomposition: present-term lifts + per-query
    constant − |q|·log2(dl+μ), P(t|C) = cf/|C| over raw counts, zero-cf
    terms dropped, candidates = docs matching ≥1 query term."""
    vals = ", ".join(
        f"({int(qid)}, '{t}')"
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    )
    return f"""WITH {TOK_CTE},
q(qid, term) AS (VALUES {vals}),
cfreq AS (
  SELECT c.term, sum(c.cnt)::DOUBLE AS cf
  FROM counts c JOIN (SELECT DISTINCT term FROM q) qt ON c.term = qt.term
  GROUP BY c.term
),
tot AS (SELECT sum(length)::DOUBLE AS t FROM docstat),
qp AS (
  SELECT q.qid, q.term, cfreq.cf / tot.t AS p
  FROM q JOIN cfreq ON q.term = cfreq.term CROSS JOIN tot
),
consts AS (
  SELECT qid, sum(log2({mu} * p)) AS cq, count(*)::BIGINT AS nq
  FROM qp GROUP BY qid
),
present AS (
  SELECT qp.qid, c.doc_id,
         sum(log2(c.cnt + {mu} * qp.p) - log2({mu} * qp.p)) AS sp
  FROM counts c JOIN qp ON c.term = qp.term
  GROUP BY qp.qid, c.doc_id
),
scored AS (
  SELECT p.qid, p.doc_id,
         p.sp + k.cq - k.nq * log2(s.length + {mu}) AS score
  FROM present p
  JOIN docstat s ON p.doc_id = s.doc_id
  JOIN consts k ON p.qid = k.qid
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_prf_topk(
    fb_docs: int = 5, fb_terms: int = 8, alpha: float = 0.5, k: int = 10
) -> str:
    """Oracle twin of registry.q_prf_topk — Rocchio pseudo-relevance
    feedback over QUERYSET: first-pass BM25, top-fb_docs pseudo-relevant
    set on round(score,6)/doc_id order, expansion weight
    w = round(Σ_fb tf·idf, 6) (positive only, originals excluded,
    top-fb_terms by w desc / term asc), final query = alpha·original
    qweight ∪ (1-alpha)·w/max_w(q) — then weighted BM25, rounded rank.
    Every quantization mirrors queryeng/prf.py op-for-op."""
    oma = 1.0 - alpha
    return f"""WITH {TOK_CTE},
q AS (SELECT qid, term, qweight FROM {_qterms_values()}),
idfs AS (
  SELECT d.term, log2((g.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf
  FROM dict d CROSS JOIN gstats g
),
s1 AS (
  SELECT q.qid, t.doc_id,
         sum( i.idf * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN q ON t.term = q.term
  JOIN idfs i ON t.term = i.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
fb AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round(score, 6) DESC, doc_id ASC) AS r
    FROM s1
  ) WHERE r <= {fb_docs}
),
lift AS (
  SELECT f.qid, t.term, round(sum(t.tf * i.idf), 6) AS w
  FROM tfn t
  JOIN fb f ON t.doc_id = f.doc_id
  JOIN idfs i ON t.term = i.term
  GROUP BY f.qid, t.term
  HAVING round(sum(t.tf * i.idf), 6) > 0
),
lift2 AS (
  SELECT l.qid, l.term, l.w
  FROM lift l LEFT JOIN q ON l.qid = q.qid AND l.term = q.term
  WHERE q.term IS NULL
),
expn AS (
  SELECT qid, term,
         round({oma!r} * w / max(w) OVER (PARTITION BY qid), 6) AS qweight
  FROM (
    SELECT qid, term, w,
           row_number() OVER (PARTITION BY qid
                              ORDER BY w DESC, term ASC) AS rn
    FROM lift2
  ) WHERE rn <= {fb_terms}
),
qx AS (
  SELECT qid, term, {alpha!r} * qweight AS qweight FROM q
  UNION ALL
  SELECT qid, term, qweight FROM expn
),
s2 AS (
  SELECT x.qid, t.doc_id,
         sum( x.qweight * i.idf * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qx x ON t.term = x.term
  JOIN idfs i ON t.term = i.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY x.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM s2
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_boolean_topk(boolean_queries: dict[int, str], k: int = 10) -> str:
    """Oracle twin of registry.q_boolean_topk — compiles the SAME ASTs
    (queryeng.boolquery.parse_boolean) to SQL: candidates are docs with
    >= 1 query term, per-term presence flags via bool_or, score =
    BM25 sum over positive terms present, predicate per qid over the
    flags, rounded rank. Grammar and predicate logic literally cannot
    drift from the Spark side — both compile one AST."""
    from .queryeng.boolquery import (
        parse_boolean,
        predicate_sql,
        query_terms,
    )

    asts = {int(q): parse_boolean(s) for q, s in sorted(boolean_queries.items())}
    qrows = []
    flag_terms: set = set()
    preds = []
    for qid, ast in asts.items():
        positive, allt = query_terms(ast)
        flag_terms.update(allt)
        qrows.extend(
            f"({qid}, '{t}', {'TRUE' if t in set(positive) else 'FALSE'})"
            for t in allt
        )
        preds.append(f"(qid = {qid} AND {predicate_sql(ast)})")
    flags = ",\n         ".join(
        f"bool_or(t.term = '{t}') AS f_{t}" for t in sorted(flag_terms)
    )
    vals = ", ".join(qrows)
    return f"""WITH {TOK_CTE},
q(qid, term, positive) AS (VALUES {vals}),
cand AS (
  SELECT q.qid, t.doc_id,
         sum(CASE WHEN q.positive THEN
               log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
               * t.tf * ({K1} + 1.0)
               / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl))
             ELSE 0.0 END) AS score,
         {flags}
  FROM tfn t
  JOIN q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
matched AS (
  SELECT qid, doc_id, score FROM cand
  WHERE {" OR ".join(preds)}
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM matched
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_total_hits() -> str:
    """Oracle twin of registry.q_query_hit_count — docs matching >= 1
    query term, per query (queries whose terms all miss yield no row)."""
    return f"""WITH {TOK_CTE},
q AS (SELECT DISTINCT qid, term FROM {_qterms_values()})
SELECT q.qid, count(DISTINCT c.doc_id)::BIGINT AS n_hits
FROM counts c JOIN q ON c.term = q.term
GROUP BY q.qid"""


def sql_grep_docs(patterns: dict[int, str]) -> str:
    """Oracle twin of registry.q_grep_docs — doc-grain substring search:
    LIKE over the P2-normalized whitespace-collapsed corpus text (the
    engine's trigram candidate + contains verify is lossless-complete
    for substrings, so plain LIKE is semantically equal). Patterns are
    normalized with the SAME shared python function the Spark side uses
    (queryeng.grepdocs.normalize_pattern)."""
    from .queryeng.grepdocs import normalize_pattern

    vals = ", ".join(
        f"({qid}, '{normalize_pattern(p)}')"
        for qid, p in sorted(patterns.items())
    )
    return rf"""WITH nd AS (
  SELECT doc_id,
         trim(regexp_replace(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
           '\s+', ' ', 'g')) AS norm
  FROM documents
),
qp(qid, pat) AS (VALUES {vals})
SELECT q.qid, d.doc_id
FROM nd d JOIN qp q ON d.norm LIKE '%' || q.pat || '%'"""


def sql_regex_grep(patterns: dict[int, str]) -> str:
    """Oracle twin of registry.q_regex_grep — doc-grain unanchored regex
    search over the P2-normalized whitespace-collapsed corpus text (the
    engine's trigram-tree candidates + rlike verify are lossless — trees
    degrade to True, never drop a match — so the plain regexp_matches
    join here is semantically equal; patterns are written over the
    normalized alphabet, RE2 ∩ java.regex subset)."""
    vals = ", ".join(
        f"({qid}, '{p}')" for qid, p in sorted(patterns.items())
    )
    return rf"""WITH nd AS (
  SELECT doc_id,
         trim(regexp_replace(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
           '\s+', ' ', 'g')) AS norm
  FROM documents
),
qp(qid, pat) AS (VALUES {vals})
SELECT q.qid, d.doc_id
FROM nd d JOIN qp q ON regexp_matches(d.norm, q.pat)"""


def sql_index_fsck() -> str:
    """Oracle twin of fsck.verify_index: the SAME seven invariants
    recomputed over the oracle's own derived tables (counts/tfn/dict/
    docstat/gstats). Both engines must report all-zero violation counts
    — the oracle side by construction, the engine side only if its four
    index tables are mutually consistent, which is what the query
    checks."""
    return f"""WITH {TOK_CTE},
postdf AS (SELECT term, count(*)::BIGINT AS pdf FROM tfn GROUP BY term),
dfm AS (
  SELECT count(*)::BIGINT AS v
  FROM dict d FULL JOIN postdf p ON d.term = p.term
  WHERE coalesce(d.df, -1) <> coalesce(p.pdf, -1)
),
csum AS (
  SELECT doc_id, sum(cnt)::BIGINT AS len2, max(cnt)::BIGINT AS max2
  FROM counts GROUP BY doc_id
),
j AS (
  SELECT s.doc_id, s.length, s.maxcnt, c.len2, c.max2
  FROM docstat s FULL JOIN csum c ON s.doc_id = c.doc_id
),
lenm AS (
  SELECT count(*)::BIGINT AS v FROM j
  WHERE coalesce(length, 0) <> coalesce(len2, 0)
),
maxm AS (
  SELECT count(*)::BIGINT AS v FROM j
  WHERE coalesce(maxcnt, 0) <> coalesce(max2, 0)
),
orph AS (
  SELECT count(*)::BIGINT AS v FROM tfn t
  WHERE NOT EXISTS (SELECT 1 FROM docstat s WHERE s.doc_id = t.doc_id)
),
tfb AS (
  SELECT count(*)::BIGINT AS v FROM tfn WHERE tf <= 0 OR tf > 1
),
st AS (
  SELECT count(*)::BIGINT AS n, round(avg(length), 6) AS a FROM docstat
),
ndm AS (
  SELECT abs(g.n_docs - st.n)::BIGINT AS v FROM gstats g CROSS JOIN st
),
avm AS (
  SELECT (CASE WHEN round(g.avgdl, 6) <> st.a THEN 1 ELSE 0 END)::BIGINT
           AS v
  FROM gstats g CROSS JOIN st
)
SELECT 'avgdl_mismatch' AS check, v AS violations FROM avm
UNION ALL SELECT 'df_mismatch', v FROM dfm
UNION ALL SELECT 'length_mismatch', v FROM lenm
UNION ALL SELECT 'maxcnt_mismatch', v FROM maxm
UNION ALL SELECT 'n_docs_mismatch', v FROM ndm
UNION ALL SELECT 'orphan_postings', v FROM orph
UNION ALL SELECT 'tf_out_of_range', v FROM tfb"""


def sql_grep_snippets(
    patterns: dict[int, str], before: int = 20, length: int = 60
) -> str:
    """Oracle twin of registry.q_grep_snippets — grep hits (plain LIKE,
    semantically equal to the engine's lossless trigram+verify) with the
    same 1-based strpos / substring window arithmetic."""
    from .queryeng.grepdocs import normalize_pattern

    vals = ", ".join(
        f"({qid}, '{normalize_pattern(p)}')"
        for qid, p in sorted(patterns.items())
    )
    return rf"""WITH nd AS (
  SELECT doc_id,
         trim(regexp_replace(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')),
           '\s+', ' ', 'g')) AS norm
  FROM documents
),
qp(qid, pat) AS (VALUES {vals}),
hit AS (
  SELECT q.qid, d.doc_id, d.norm, q.pat,
         strpos(d.norm, q.pat)::BIGINT AS mpos
  FROM nd d JOIN qp q ON d.norm LIKE '%' || q.pat || '%'
)
SELECT qid, doc_id, mpos,
       substring(norm, greatest(1, mpos - {before})::INT, {length})
         AS snippet
FROM hit"""


def sql_trending_terms(min_df: int = 5, top_n: int = 20) -> str:
    """Oracle twin of websnap.trending_terms over the index's per-doc
    counts with the fixture crawl timestamp (warc_ts ~ (doc_id*37)%1000
    hours, oracle_sql_ops._WARC_TS_SQL): early window = tsk < 500.
    ratio uses floor(x·10⁶+0.5)/10⁶ — same IEEE ops as the Spark side
    (round() would diverge half-even vs HALF_UP)."""
    return f"""WITH {TOK_CTE},
trend AS (
  SELECT term,
         count(*) FILTER (WHERE (doc_id * 37) % 1000 < 500)  AS df_early,
         count(*) FILTER (WHERE (doc_id * 37) % 1000 >= 500) AS df_late
  FROM counts GROUP BY term
),
t2 AS (
  SELECT term, df_early::BIGINT AS df_early, df_late::BIGINT AS df_late,
         floor((df_late + 1.0) / (df_early + 1.0) * 1e6 + 0.5) / 1e6 AS ratio
  FROM trend WHERE df_early + df_late >= {min_df}
)
SELECT term, df_early, df_late, ratio,
       row_number() OVER (ORDER BY ratio DESC, term ASC)::BIGINT AS rank
FROM t2
ORDER BY rank
LIMIT {top_n}"""


def sql_mmr_topk(k: int = 5, pool_n: int = 20, lam: float = 0.7) -> str:
    """Oracle twin of queryeng/mmr.mmr_rerank: BM25 top-``pool_n`` pool
    joined to embeddings, then the greedy MMR selection UNROLLED as one
    CTE per step (argmax of floor-rounded λ·rel − (1−λ)·max-sim over the
    not-yet-selected pool; doc_id-asc ties). Every step CTE is
    MATERIALIZED — the chain is referenced multiple times and DuckDB
    would otherwise inline it exponentially. (1−λ) is emitted via repr
    so both engines use the identical IEEE double."""
    dot = (
        "list_sum([p.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE "
        "for i in range(1, len(p.embedding) + 1)])"
    )
    na = (
        "sqrt(list_sum([p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE "
        "for i in range(1, len(p.embedding) + 1)]))"
    )
    nb = (
        "sqrt(list_sum([q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE "
        "for i in range(1, len(q.embedding) + 1)]))"
    )
    one_minus = repr(1.0 - float(lam))
    ctes = [
        f"""ranked AS (
  SELECT qid, doc_id, round(score, 6) AS rel,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rn
  FROM scored)""",
        f"""pool AS MATERIALIZED (
  SELECT r.qid, r.doc_id, r.rel, e.embedding
  FROM ranked r JOIN embeddings e ON e.vec_id = r.doc_id
  WHERE r.rn <= {pool_n})""",
        f"""sims AS MATERIALIZED (
  SELECT p.qid, p.doc_id AS d1, q.doc_id AS d2,
         {dot} / ({na} * {nb}) AS sim
  FROM pool p JOIN pool q ON p.qid = q.qid AND p.doc_id <> q.doc_id)""",
        """sel1 AS MATERIALIZED (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, doc_id ASC) AS rn
    FROM pool) z WHERE rn = 1)""",
    ]
    for i in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT qid, doc_id FROM sel{j}" for j in range(1, i)
        )
        ctes.append(f"prev{i} AS MATERIALIZED ({prev})")
        ctes.append(
            f"""sel{i} AS MATERIALIZED (
  SELECT qid, doc_id FROM (
    SELECT p.qid, p.doc_id,
           row_number() OVER (PARTITION BY p.qid ORDER BY
             floor(({lam!r} * p.rel - {one_minus} * (
                SELECT max(s.sim) FROM sims s
                JOIN prev{i} u ON u.qid = s.qid AND u.doc_id = s.d2
                WHERE s.qid = p.qid AND s.d1 = p.doc_id
             )) * 1e6 + 0.5) / 1e6 DESC, p.doc_id ASC) AS rn
    FROM pool p
    WHERE NOT EXISTS (SELECT 1 FROM prev{i} u
                      WHERE u.qid = p.qid AND u.doc_id = p.doc_id)
  ) z WHERE rn = 1)"""
        )
    final = " UNION ALL ".join(
        f"SELECT qid, doc_id, {i} AS rank FROM sel{i}" for i in range(1, k + 1)
    )
    return (
        f"{_bm25_scored_cte()},\n" + ",\n".join(ctes)
        + f"\nSELECT qid, doc_id, rank::BIGINT AS rank FROM ({final}) f"
    )


# The recrawl-scenario snapshot ranking, replicating the web-snapshot
# fixture mapping (oracle_sql_ops._PAGES_CTE / websnap.snapshot_view:
# url = https://<source>.example.org/p/<doc_id%7>, recrawl order =
# warc_ts = epoch + ((doc_id*37)%1000)*3600, doc_id-desc ties) and
# websnap.snapshot_diff's rank<=2 window: rn=1 is the new crawl's
# snapshot (cur), rn=2 the previous one (prev); a URL changed iff their
# texts differ (snapshot_diff compares md5(text) — same predicate).
_RECRAWL_SNAP = """(
  SELECT doc_id, text,
         row_number() OVER w AS rn,
         count(*)     OVER (PARTITION BY url) AS n,
         lead(text)   OVER w AS nxt,
         lag(text)    OVER w AS prv
  FROM (
    SELECT doc_id, text,
           'https://' || source || '.example.org/p/'
             || CAST(doc_id % 7 AS VARCHAR)  AS url,
           (doc_id * 37) % 1000              AS tsk
    FROM documents
  )
  WINDOW w AS (PARTITION BY url ORDER BY tsk DESC, doc_id DESC)
)"""

# merged-cur: the new crawl's snapshot where the URL is new (n=1) or its
# text changed vs prev — exactly snapshot_diff's 'new'/'changed' set.
_RECRAWL_CUR = "(rn = 1 AND (n = 1 OR text <> nxt))"
# indexed corpus pre-compaction = base (every prev) ∪ merged curs
_RECRAWL_STATS = f"rn = 2 OR {_RECRAWL_CUR}"
# live set = merged curs ∪ prevs whose cur was unchanged (still serving)
_RECRAWL_LIVE = f"{_RECRAWL_CUR} OR (rn = 2 AND text = prv)"


def sql_recrawl_update_topk(k: int = 10) -> str:
    """Oracle twin of registry.q_recrawl_update_topk — the recrawl-updated
    index BEFORE compaction: stats (df/N/avgdl) over base ∪ merged curs
    (superseded prevs still counted — Lucene stale-stats), candidates
    masked to the live set."""
    stats = f"doc_id IN (SELECT doc_id FROM {_RECRAWL_SNAP} WHERE {_RECRAWL_STATS})"
    live = f"dd.doc_id IN (SELECT doc_id FROM {_RECRAWL_SNAP} WHERE {_RECRAWL_LIVE})"
    return f"""{_bm25_scored_cte(corpus_where=stats, doc_filter=live)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_recrawl_compacted_topk(k: int = 10) -> str:
    """Oracle twin of registry.q_recrawl_compacted_topk — after the
    post-recrawl compaction the superseded versions are physically gone,
    so the index IS a fresh build over the live set alone."""
    live = f"doc_id IN (SELECT doc_id FROM {_RECRAWL_SNAP} WHERE {_RECRAWL_LIVE})"
    return f"""{_bm25_scored_cte(corpus_where=live)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_topk_recency(
    k: int = 10,
    now_ts: int = 1546300800 + 999 * 3600,
    half_life_days: float = 7.0,
) -> str:
    """Oracle twin of temporal.bm25_topk_recency: multiplicative
    time-decay boost 2^(-age_days/half_life) on the BM25 score, ranked
    on the rounded boosted score. warc_ts comes from THE deterministic
    fixture formula (oracle_sql_ops._WARC_TS_SQL ≡ websnap.warc_ts_expr
    — single source each side); ``now_ts`` defaults to that formula's
    maximum so every age is >= 0 and the greatest() clamp is exercised
    as a no-op at the boundary doc."""
    warc_ts = "(1546300800 + ((s2.doc_id * 37) % 1000) * 3600)"
    boost = (
        f"power(2.0, -greatest(({now_ts} - {warc_ts}) / 86400.0, 0.0)"
        f" / {half_life_days!r})"
    )
    return f"""{_bm25_scored_cte()},
boosted AS (
  SELECT s2.qid, s2.doc_id, s2.score * {boost} AS score
  FROM scored s2
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM boosted
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_index_profile() -> str:
    """Oracle twin of indexing.profile.dictionary_profile: log2-bucketed
    df histogram over the dictionary (floor(log2) is IEEE-exact at the
    bucket boundaries on both engines)."""
    return f"""WITH {TOK_CTE}
SELECT floor(log2(df))::BIGINT AS df_bucket,
       count(*)::BIGINT AS n_terms,
       sum(df)::BIGINT AS postings
FROM dict GROUP BY 1"""


def sql_ltr_features() -> str:
    """Oracle twin of ltr.ltr_features: the lexical feature family per
    (qid, candidate doc) — one grouped pass over the matched postings,
    same BM25 part expression as the scorers, coverage denominator =
    ALL distinct query terms (unknown included)."""
    idf = "log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))"
    part = (
        f"{idf} * t.tf * ({K1} + 1.0)"
        f" / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl))"
    )
    return f"""WITH {TOK_CTE},
nq AS (
  SELECT qid, count(DISTINCT term)::BIGINT AS n_q
  FROM {_qterms_values()} GROUP BY qid
),
feat AS (
  SELECT q.qid, t.doc_id, s.length,
         sum({part}) AS bm25,
         count(DISTINCT t.term)::BIGINT AS n_matched,
         sum(t.tf) AS sum_tf,
         max(t.tf) AS max_tf,
         min({idf}) AS min_idf,
         max({idf}) AS max_idf
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id, s.length
)
SELECT f.qid, f.doc_id, round(f.bm25, 6) AS bm25, f.n_matched,
       round(f.n_matched * 1.0 / nq.n_q, 6) AS coverage,
       round(f.sum_tf, 6) AS sum_tf, round(f.max_tf, 6) AS max_tf,
       round(f.min_idf, 6) AS min_idf, round(f.max_idf, 6) AS max_idf,
       f.length
FROM feat f JOIN nq USING (qid)"""


def sql_ltr_rerank_topk(weights: dict[str, float], k: int = 10) -> str:
    """Oracle twin of ltr.ltr_rerank_topk over sql_ltr_features' feat
    CTE: the SAME 6-dp-rounded features dotted with the SAME literal
    weights, ranked on the rounded model score."""
    idf = "log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))"
    part = (
        f"{idf} * t.tf * ({K1} + 1.0)"
        f" / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl))"
    )
    rounded = {
        "bm25": "round(f.bm25, 6)",
        "n_matched": "f.n_matched",
        "coverage": "round(f.n_matched * 1.0 / nq.n_q, 6)",
        "sum_tf": "round(f.sum_tf, 6)",
        "max_tf": "round(f.max_tf, 6)",
        "min_idf": "round(f.min_idf, 6)",
        "max_idf": "round(f.max_idf, 6)",
        "length": "f.length",
    }
    dot = " + ".join(
        f"{weights[name]!r} * {rounded[name]}" for name in sorted(weights)
    )
    return f"""WITH {TOK_CTE},
nq AS (
  SELECT qid, count(DISTINCT term)::BIGINT AS n_q
  FROM {_qterms_values()} GROUP BY qid
),
feat AS (
  SELECT q.qid, t.doc_id, s.length,
         sum({part}) AS bm25,
         count(DISTINCT t.term)::BIGINT AS n_matched,
         sum(t.tf) AS sum_tf,
         max(t.tf) AS max_tf,
         min({idf}) AS min_idf,
         max({idf}) AS max_idf
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id, s.length
),
ranked AS (
  SELECT f.qid, f.doc_id, round(0.0 + {dot}, 6) AS ltr_score,
         row_number() OVER (
           PARTITION BY f.qid
           ORDER BY round(0.0 + {dot}, 6) DESC, f.doc_id ASC) AS rank
  FROM feat f JOIN nq USING (qid)
)
SELECT qid, doc_id, ltr_score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_percolate(mode: str = "all") -> str:
    """Oracle twin of percolate.percolate over the unstemmed pipeline:
    distinct doc terms x distinct stored-query terms, per-(doc, qid)
    match count, kept per mode (all = every query term present)."""
    cond = {
        "all": "m.n_matched = r.n_req",
        "any": "m.n_matched >= 1",
    }[mode]
    return f"""WITH {_TOK_HEAD}
dterms AS (SELECT DISTINCT doc_id, term FROM tok_f),
q AS (SELECT DISTINCT qid, term FROM {_qterms_values()}),
req AS (SELECT qid, count(*)::BIGINT AS n_req FROM q GROUP BY qid),
m AS (
  SELECT d.doc_id, q.qid, count(*)::BIGINT AS n_matched
  FROM dterms d JOIN q USING (term)
  GROUP BY d.doc_id, q.qid
)
SELECT m.doc_id, m.qid, m.n_matched
FROM m JOIN req r USING (qid) WHERE {cond}"""


def sql_snippets_topk(k: int = 5, before: int = 30, length: int = 80) -> str:
    """Oracle twin of snippets.kwic_snippets over the BM25 top-k: first
    token-boundary occurrence of any query term in the space-padded
    normalized text (char positions map 1:1 to the original text because
    P2 normalization is length-preserving), then a substring window of
    the ORIGINAL text."""
    return f"""{_bm25_scored_cte()},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
hits AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= {k}),
firsthit AS (
  SELECT h.qid, h.doc_id, h.rank,
         min(nullif(strpos(
           ' ' || lower(regexp_replace(d.text, '[^a-zA-Z0-9]', ' ', 'g')) || ' ',
           ' ' || q.term || ' '), 0)) AS mpos,
         any_value(d.text) AS text
  FROM hits h
  JOIN documents d ON h.doc_id = d.doc_id
  JOIN {_qterms_values()} ON h.qid = q.qid
  GROUP BY h.qid, h.doc_id, h.rank
)
SELECT qid, doc_id, rank::BIGINT AS rank,
       substring(text, greatest(1, mpos - {before}), {length}) AS snippet
FROM firsthit"""


def sql_collapse_topk(
    k: int = 10, group_col: str = "source", per_group: int = 2
) -> str:
    """Oracle twin of metadata.collapse_topk: per-(qid, group) rank caps
    each group at ``per_group`` BEFORE the global per-qid top-k."""
    return f"""{_bm25_scored_cte()},
grouped AS (
  SELECT s.qid, s.doc_id, round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.qid, d.{group_col}
                            ORDER BY round(s.score, 6) DESC, s.doc_id ASC)
           AS grank
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM grouped WHERE grank <= {per_group}
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_grouped_topk(
    n_groups: int = 5, per_group: int = 3, group_col: str = "source"
) -> str:
    """Oracle twin of metadata.grouped_topk: groups ranked by best
    member (rounded score desc, group asc), top n_groups per query, each
    with its inner top-per_group docs."""
    return f"""{_bm25_scored_cte()},
inner_h AS (
  SELECT s.qid, d.{group_col} AS grp, s.doc_id,
         round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.qid, d.{group_col}
                            ORDER BY round(s.score, 6) DESC, s.doc_id ASC)
           AS inner_rank
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
),
tg AS (
  SELECT qid, grp,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, grp ASC) AS group_rank
  FROM inner_h WHERE inner_rank = 1
)
SELECT i.qid, i.grp AS "group", t.group_rank::BIGINT AS group_rank,
       i.doc_id, i.score, i.inner_rank::BIGINT AS inner_rank
FROM inner_h i JOIN tg t ON i.qid = t.qid AND i.grp = t.grp
WHERE i.inner_rank <= {per_group} AND t.group_rank <= {n_groups}"""


def sql_related_terms(top_n: int = 5, min_df: int = 2) -> str:
    """Oracle twin of related.related_terms: document-level PMI between
    each query's match set and co-occurring terms, excluding the query's
    own terms."""
    return f"""WITH {TOK_CTE},
qt AS (SELECT DISTINCT qid, term FROM {_qterms_values()}),
cand AS (
  SELECT DISTINCT qt.qid, c.doc_id
  FROM counts c JOIN qt ON c.term = qt.term
),
qsize AS (SELECT qid, count(*) AS q_df FROM cand GROUP BY qid),
co AS (
  SELECT cand.qid, k.term, count(*) AS co_df
  FROM cand JOIN counts k ON cand.doc_id = k.doc_id
  GROUP BY cand.qid, k.term
),
pmi AS (
  SELECT co.qid, co.term,
         round(log2(co.co_df * g.n_docs::DOUBLE / (s.q_df * d.df)), 6) AS pmi
  FROM co
  JOIN dict d ON co.term = d.term AND d.df >= {min_df}
  JOIN qsize s ON co.qid = s.qid
  CROSS JOIN gstats g
  LEFT JOIN qt ON co.qid = qt.qid AND co.term = qt.term
  WHERE qt.term IS NULL
),
ranked AS (
  SELECT qid, term, pmi,
         row_number() OVER (PARTITION BY qid
                            ORDER BY pmi DESC, term ASC) AS rank
  FROM pmi
)
SELECT qid, term, pmi, rank::BIGINT AS rank
FROM ranked WHERE rank <= {top_n}"""


# quoted-phrase query set for the positional-index op: frequent corpus
# bigrams + a trigram + a no-match phrase
PHRASESET: dict[int, str] = {
    1: "table hash",
    2: "customer join",
    3: "merge group order",
    4: "zz unmatched phrase",
}


MLT_DOC_IDS = (0, 7, 42)


def sql_more_like_this(k: int = 10, top_terms: int = 5) -> str:
    """Oracle twin of mlt.more_like_this + rounded-rank top-k over
    MLT_DOC_IDS: per-source-doc top terms by cnt·idf, standard BM25,
    source doc excluded."""
    ids = ", ".join(str(i) for i in MLT_DOC_IDS)
    return f"""WITH {TOK_CTE},
mlt AS (
  SELECT doc_id AS qid, term FROM (
    SELECT c.doc_id, c.term,
           row_number() OVER (
             PARTITION BY c.doc_id
             ORDER BY round(c.cnt * log2((g.n_docs - d.df + 0.5)
                                         / (d.df + 0.5)), 6)
                      DESC, c.term ASC) AS r
    FROM counts c
    JOIN dict d ON c.term = d.term
    CROSS JOIN gstats g
    WHERE c.doc_id IN ({ids})
  ) WHERE r <= {top_terms}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN mlt q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  WHERE t.doc_id <> q.qid
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def _sql_phrase_scaffold(k: int, per_phrase_sql) -> str:
    """Shared scaffolding for the phrase oracles: normalized UNFILTERED
    token positions (tokarr/tokpos CTEs), one SELECT per PHRASESET entry
    (``per_phrase_sql(qid, terms)``), rank + top-k tail. One body, two
    join predicates — the exact and proximity oracles cannot drift."""
    union = "\nUNION ALL\n".join(
        per_phrase_sql(qid, phrase.split())
        for qid, phrase in sorted(PHRASESET.items())
    )
    return f"""WITH tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(
           lower(regexp_replace(text, '[^a-zA-Z0-9]', ' ', 'g')), '\\s+'),
           t -> t <> '') AS toks
  FROM documents
),
tokpos AS (
  SELECT doc_id, u.s.pos AS pos, u.s.term AS term
  FROM tokarr,
       unnest([{{'pos': i, 'term': toks[i]}}
               for i in range(1, len(toks) + 1)]) u(s)
),
occ AS (
{union}
),
ranked AS (
  SELECT qid::BIGINT AS qid, doc_id, phrase_tf,
         row_number() OVER (PARTITION BY qid
                            ORDER BY phrase_tf DESC, doc_id ASC) AS rank
  FROM occ
)
SELECT qid, doc_id, phrase_tf, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_phrase_topk(k: int = 10) -> str:
    """Oracle twin of phrase.phrase_topk over PHRASESET: positions over
    the normalized UNFILTERED token stream; an n-term phrase matches at
    start positions where each term sits at pos + i."""

    def per_phrase(qid, terms):
        joins = "\n  ".join(
            f"JOIN tokpos p{i} ON p0.doc_id = p{i}.doc_id "
            f"AND p{i}.pos = p0.pos + {i} AND p{i}.term = '{terms[i]}'"
            for i in range(1, len(terms))
        )
        return f"""SELECT {qid} AS qid, p0.doc_id, count(*)::BIGINT AS phrase_tf
FROM tokpos p0
  {joins}
WHERE p0.term = '{terms[0]}'
GROUP BY p0.doc_id"""

    return _sql_phrase_scaffold(k, per_phrase)


def sql_phrase_near_topk(k: int = 10, max_gap: int = 1) -> str:
    """Oracle twin of phrase.phrase_topk(max_gap>0): ordered proximity —
    each next term within 1+max_gap tokens after the previous; counts
    are DISTINCT start positions."""

    def per_phrase(qid, terms):
        joins = "\n  ".join(
            f"JOIN tokpos p{i} ON p0.doc_id = p{i}.doc_id "
            f"AND p{i}.term = '{terms[i]}' "
            f"AND p{i}.pos > p{i - 1}.pos "
            f"AND p{i}.pos <= p{i - 1}.pos + {1 + max_gap}"
            for i in range(1, len(terms))
        )
        return f"""SELECT {qid} AS qid, p0.doc_id,
       count(DISTINCT p0.pos)::BIGINT AS phrase_tf
FROM tokpos p0
  {joins}
WHERE p0.term = '{terms[0]}'
GROUP BY p0.doc_id"""

    return _sql_phrase_scaffold(k, per_phrase)


def sql_bm25_topk_conjunctive(k: int = 10) -> str:
    """Oracle twin of metadata.conjunctive_scores + top-k: docs must
    contain ALL of the query's distinct dictionary-known terms."""
    return f"""WITH {TOK_CTE},
qt AS (SELECT DISTINCT qid, term FROM {_qterms_values()}),
need AS (
  SELECT qt.qid, count(DISTINCT qt.term) AS n
  FROM qt JOIN dict d ON qt.term = d.term GROUP BY qt.qid
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score,
         count(DISTINCT t.term) AS m
  FROM tfn t
  JOIN qt q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT sc.qid, sc.doc_id, round(sc.score, 6) AS score,
         row_number() OVER (PARTITION BY sc.qid
                            ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC)
           AS rank
  FROM scored sc JOIN need ON sc.qid = need.qid AND sc.m = need.n
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_spell_suggest(
    terms: tuple[str, ...], top_n: int = 3, min_df: int = 1
) -> str:
    """Oracle twin of spell.spell_suggest: deletion-key candidates ∩
    exact levenshtein <= 1, ranked by df desc, suggestion asc."""
    vals = ", ".join(f"('{t}')" for t in terms)
    keys = (
        "list_append([substr({c}, 1, i-1) || substr({c}, i+1) "
        "FOR i IN range(1, length({c}) + 1)], {c})"
    )
    return f"""WITH {TOK_CTE},
q(term) AS (VALUES {vals}),
qk AS (SELECT term, unnest({keys.format(c='term')}) AS key FROM q),
dk AS (
  SELECT term AS suggestion, df, unnest({keys.format(c='term')}) AS key
  FROM dict WHERE df >= {min_df}
),
cand AS (
  SELECT DISTINCT qk.term, dk.suggestion, dk.df
  FROM qk JOIN dk ON qk.key = dk.key
  WHERE qk.term <> dk.suggestion
),
ranked AS (
  SELECT term, suggestion, df,
         row_number() OVER (PARTITION BY term
                            ORDER BY df DESC, suggestion ASC) AS rank
  FROM cand WHERE levenshtein(term, suggestion) <= 1
)
SELECT term, suggestion, df, rank::BIGINT AS rank
FROM ranked WHERE rank <= {top_n}"""


def sql_autocomplete(prefixes: tuple[str, ...], top_n: int = 5) -> str:
    vals = ", ".join(f"('{p}')" for p in prefixes)
    return f"""WITH {TOK_CTE},
p(prefix) AS (VALUES {vals}),
ranked AS (
  SELECT p.prefix, d.term AS suggestion, d.df,
         row_number() OVER (PARTITION BY p.prefix
                            ORDER BY d.df DESC, d.term ASC) AS rank
  FROM dict d JOIN p ON starts_with(d.term, p.prefix)
)
SELECT prefix, suggestion, df, rank::BIGINT AS rank
FROM ranked WHERE rank <= {top_n}"""


def sql_facet_counts(facet_cols: tuple[str, ...] = ("lang",)) -> str:
    """Oracle twin of metadata.facet_counts: distinct (qid, doc_id)
    existential matches rolled up per facet value."""
    cols = ", ".join(f"d.{c}" for c in facet_cols)
    return f"""WITH {TOK_CTE},
cand AS (
  SELECT DISTINCT q.qid, t.doc_id
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
)
SELECT c.qid, {cols}, count(*)::BIGINT AS n_docs
FROM cand c JOIN documents d ON c.doc_id = d.doc_id
GROUP BY c.qid, {cols}"""


def sql_common_terms_topk(
    k: int, max_df_frac: float, queryset: dict[int, str]
) -> str:
    """Oracle twin of metadata.common_terms_topk: candidates from the
    per-query rare-term match set (rare = df <= frac·N; a query whose
    known terms are all common treats them all as rare), scores the
    full-OR BM25 sum restricted to candidates."""
    return f"""{_bm25_scored_cte(queryset=queryset)},
qdf AS (
  SELECT DISTINCT q.qid, q.term, d.df
  FROM {_qterms_values(False, queryset)} JOIN dict d ON q.term = d.term
),
qflag AS (
  SELECT qid, term,
         df <= {max_df_frac!r} * (SELECT n_docs FROM gstats) AS is_rare
  FROM qdf
),
qrare AS (
  SELECT qid, term FROM qflag WHERE is_rare
  UNION ALL
  SELECT qid, term FROM qflag
  WHERE qid IN (SELECT qid FROM qflag
                GROUP BY qid HAVING bool_and(NOT is_rare))
),
cand AS (
  SELECT DISTINCT r.qid, t.doc_id FROM tfn t JOIN qrare r ON t.term = r.term
),
ranked AS (
  SELECT s.qid, s.doc_id, round(s.score, 6) AS score,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY round(s.score, 6) DESC,
                                     s.doc_id ASC) AS rank
  FROM scored s JOIN cand c ON s.qid = c.qid AND s.doc_id = c.doc_id
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_interleave_topk(k: int = 10) -> str:
    """Oracle twin of registry.q_interleave_topk: the team-draft greedy
    merge replayed as a RECURSIVE CTE — one pick per recursion step,
    next candidate per side = first not-yet-picked list element
    (list_filter), tie coin = parity of the last hex digit of
    md5('qid|round') (≡ interleave._coin's int(hexdigest,16) & 1 — the
    low bit of a hex number IS its last digit's low bit)."""
    head = _bm25_scored_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    coin = (
        "(strpos('0123456789abcdef', "
        "substr(md5(d0.qid::VARCHAR || '|' || d0.rnd::VARCHAR), 32, 1))"
        " - 1) % 2"
    )
    pick_a = (
        "ca IS NOT NULL AND (cb IS NULL OR d.na < d.nb"
        " OR (d.na = d.nb AND d.coin = 0))"
    )
    return f"""{head},
a_ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
a_top AS (SELECT * FROM a_ranked WHERE rank <= {k}),
cand AS (
  SELECT DISTINCT q.qid, t.doc_id
  FROM tfn t JOIN {_qterms_values()} ON t.term = q.term
),
b_ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY (1546300800 + ((doc_id * 37) % 1000) * 3600) DESC,
                    doc_id ASC) AS rank
  FROM cand
),
b_top AS (SELECT * FROM b_ranked WHERE rank <= {k}),
la_t AS (SELECT qid, list(doc_id ORDER BY rank) AS la FROM a_top GROUP BY qid),
lb_t AS (SELECT qid, list(doc_id ORDER BY rank) AS lb FROM b_top GROUP BY qid),
lists AS (
  SELECT coalesce(la_t.qid, lb_t.qid) AS qid,
         coalesce(la, []) AS la, coalesce(lb, []) AS lb
  FROM la_t FULL JOIN lb_t ON la_t.qid = lb_t.qid
),
draft AS (
  SELECT qid, []::BIGINT[] AS picked, []::VARCHAR[] AS teams,
         0 AS na, 0 AS nb, 0 AS rnd
  FROM lists
  UNION ALL
  SELECT d.qid, list_append(d.picked, d.pick),
         list_append(d.teams, d.team),
         d.na + CASE WHEN d.team = 'a' THEN 1 ELSE 0 END,
         d.nb + CASE WHEN d.team = 'b' THEN 1 ELSE 0 END,
         d.rnd + 1
  FROM (
    SELECT d.qid, d.picked, d.teams, d.na, d.nb, d.rnd,
           CASE WHEN {pick_a} THEN 'a' ELSE 'b' END AS team,
           CASE WHEN {pick_a} THEN ca ELSE cb END AS pick
    FROM (
      SELECT d0.*,
             list_filter(l.la,
                         x -> NOT list_contains(d0.picked, x))[1] AS ca,
             list_filter(l.lb,
                         x -> NOT list_contains(d0.picked, x))[1] AS cb,
             {coin} AS coin
      FROM draft d0 JOIN lists l USING (qid)
    ) d
  ) d
  WHERE d.pick IS NOT NULL
),
done AS (
  SELECT qid, arg_max(picked, rnd) AS picked, arg_max(teams, rnd) AS teams
  FROM draft GROUP BY qid
)
SELECT qid, unnest(picked) AS doc_id,
       unnest(range(1, len(picked) + 1)) AS pos,
       unnest(teams) AS team
FROM done"""


def sql_sort_field_topk(k: int = 10) -> str:
    """Oracle twin of metadata.sort_by_field_topk over the warc_ts
    fixture: the existential match set ranked newest-first with doc_id
    tiebreak. warc_ts comes from THE fixture formula (single source each
    side: websnap.warc_ts_expr / this literal)."""
    return f"""WITH {TOK_CTE},
cand AS (
  SELECT DISTINCT q.qid, t.doc_id
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
),
ranked AS (
  SELECT c.qid, c.doc_id,
         (1546300800 + ((c.doc_id * 37) % 1000) * 3600)::BIGINT AS sort_val,
         row_number() OVER (
           PARTITION BY c.qid
           ORDER BY (1546300800 + ((c.doc_id * 37) % 1000) * 3600) DESC,
                    c.doc_id ASC) AS rank
  FROM cand c
)
SELECT qid, doc_id, sort_val, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_range_facets(value_col: str, edges: list[float]) -> str:
    """Oracle twin of metadata.range_facets over n_chars-style numeric
    doc attributes: same distinct-candidate head as facet_counts, the
    bucket as the same CASE chain (last bucket right-closed, out-of-range
    → -1), lo/hi looked up from the edge list."""
    cases = [f"WHEN d.{value_col} < {edges[0]!r} THEN -1"]
    for i in range(len(edges) - 1):
        op = "<=" if i == len(edges) - 2 else "<"
        cases.append(
            f"WHEN d.{value_col} >= {edges[i]!r} "
            f"AND d.{value_col} {op} {edges[i + 1]!r} THEN {i}"
        )
    case_sql = "CASE " + " ".join(cases) + " ELSE -1 END"
    lo_arr = ", ".join(repr(float(e)) for e in edges[:-1])
    hi_arr = ", ".join(repr(float(e)) for e in edges[1:])
    return f"""WITH {TOK_CTE},
cand AS (
  SELECT DISTINCT q.qid, t.doc_id
  FROM tfn t
  JOIN {_qterms_values()} ON t.term = q.term
),
bucketed AS (
  SELECT c.qid, ({case_sql})::BIGINT AS bucket
  FROM cand c JOIN documents d ON c.doc_id = d.doc_id
)
SELECT qid, bucket,
       CASE WHEN bucket >= 0
            THEN (([{lo_arr}])[bucket + 1])::DOUBLE END AS lo,
       CASE WHEN bucket >= 0
            THEN (([{hi_arr}])[bucket + 1])::DOUBLE END AS hi,
       count(*)::BIGINT AS n_docs
FROM bucketed GROUP BY qid, bucket"""


def sql_dictionary_stemmed() -> str:
    return f"WITH {tok_cte_stemmed()} SELECT term, df FROM dict"


def sql_bm25_topk_stemmed(k: int = 10) -> str:
    return f"""{_bm25_scored_cte(stem=True)},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def _expansion_ctes(
    prefix_len: int, expansion_weight: float, syn_body: str | None = None
) -> str:
    """CTE chain ending in expq(qid, term, qweight, is_expansion) — the
    synonym-source expansion capped at the original distinct-term count
    per qid. ``syn_body`` overrides the default prefix-synonym source
    (must yield columns (term, synonym)). Shared by sql_query_expansion,
    sql_query_expansion_emb and sql_bm25_topk_expanded."""
    # per-prefix group cap mirrors expansion.prefix_synonyms(max_group=64)
    syn = syn_body or f"""
  SELECT a.term, b.term AS synonym
  FROM (SELECT term, pfx FROM (
          SELECT term, substr(term, 1, {prefix_len}) AS pfx,
                 row_number() OVER (
                   PARTITION BY substr(term, 1, {prefix_len})
                   ORDER BY term ASC) AS r
          FROM dict WHERE length(term) >= {prefix_len})
        WHERE r <= 64) a
  JOIN (SELECT term, pfx FROM (
          SELECT term, substr(term, 1, {prefix_len}) AS pfx,
                 row_number() OVER (
                   PARTITION BY substr(term, 1, {prefix_len})
                   ORDER BY term ASC) AS r
          FROM dict WHERE length(term) >= {prefix_len})
        WHERE r <= 64) b
    ON a.pfx = b.pfx
  WHERE a.term <> b.term
"""
    return f"""q AS (SELECT DISTINCT qid, term, qweight::DOUBLE AS qweight FROM {_qterms_values()}),
syn AS ({syn}),
norig AS (SELECT qid, count(*) AS n_terms FROM q GROUP BY qid),
cand AS (
  SELECT DISTINCT q.qid, s.synonym AS term
  FROM q JOIN syn s ON q.term = s.term
  WHERE NOT EXISTS (SELECT 1 FROM q q2
                    WHERE q2.qid = q.qid AND q2.term = s.synonym)
),
capped AS (
  SELECT c.qid, c.term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY term ASC) AS r
    FROM cand) c JOIN norig USING (qid)
  WHERE c.r <= norig.n_terms
),
expq AS (
  SELECT qid, term, qweight, FALSE AS is_expansion FROM q
  UNION ALL
  SELECT qid, term, {expansion_weight}::DOUBLE AS qweight, TRUE AS is_expansion
  FROM capped
)"""


def sql_query_expansion(prefix_len: int = 4, expansion_weight: float = 0.5) -> str:
    """P6/P7 operator twin: prefix-synonym expansion capped at the
    original distinct-term count per qid."""
    return f"""WITH {TOK_CTE},
{_expansion_ctes(prefix_len, expansion_weight)}
SELECT qid, term, qweight, is_expansion FROM expq"""


def _emb_syn_ctes(
    top_n: int, *, n_planes: int = 16, bands: int = 8, dim: int = 64
) -> str:
    """CTE chain ending in a (term, synonym) relation: term vectors =
    per-dimension mean of containing docs' embeddings, synonyms = top-n
    cosine neighbors (rounded-cosine rank, synonym-asc ties) — the DuckDB
    twin of queryeng.expansion.embedding_synonyms.

    Candidate pairs come from the SAME deterministic SRP banding as the
    Spark plan (literal ±1 hyperplanes from simsearch.srp_signs, band-key
    equality) — both engines agree bit-for-bit even where LSH recall < 1,
    exactly as sql_srp_lsh_pairs does for document vectors."""
    from .pipeline_ops.simsearch import srp_signs

    r = n_planes // bands
    mask = (1 << r) - 1
    bits = []
    for i in range(n_planes):
        lst = "[" + ", ".join(f"{s:.1f}" for s in srp_signs(i, dim)) + "]"
        bits.append(
            f"(CASE WHEN list_sum([vec[d] * ({lst})[d] "
            f"for d in range(1, {dim + 1})]) >= 0 "
            f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        )
    sig_expr = "\n         + ".join(bits)
    band_rows = ", ".join(
        f"({b}, (srp >> {b * r}) & {mask})" for b in range(bands)
    )
    return f"""dims AS (
  SELECT unnest(range(1, (SELECT len(embedding) FROM embeddings LIMIT 1) + 1)) AS pos
),
tdocs AS (SELECT DISTINCT term, doc_id FROM counts),
tv AS (
  SELECT t.term, dims.pos, avg(e.embedding[dims.pos]::DOUBLE) AS v
  FROM tdocs t
  JOIN embeddings e ON t.doc_id = e.vec_id
  CROSS JOIN dims
  GROUP BY t.term, dims.pos
),
tvec AS (
  SELECT term, list(v ORDER BY pos) AS vec, sqrt(sum(v * v)) AS n
  FROM tv GROUP BY term
),
tsigs AS (
  SELECT term,
         {sig_expr} AS srp
  FROM tvec
),
tbanded AS (
  SELECT term, bk.* FROM tsigs,
  LATERAL (SELECT * FROM (VALUES {band_rows}) v(band, key)) bk
),
tcand AS (
  SELECT DISTINCT x.term AS term, y.term AS synonym
  FROM tbanded x JOIN tbanded y
    ON x.band = y.band AND x.key = y.key AND x.term <> y.term
),
tcos AS (
  SELECT c.term, c.synonym,
         list_sum([a.vec[d] * b.vec[d] for d in range(1, {dim + 1})])
           / (a.n * b.n) AS cosine
  FROM tcand c
  JOIN tvec a ON a.term = c.term
  JOIN tvec b ON b.term = c.synonym
),
tnn AS (
  SELECT term, synonym,
         row_number() OVER (PARTITION BY term
                            ORDER BY round(cosine, 6) DESC, synonym ASC) AS r
  FROM tcos
)"""


def sql_query_expansion_emb(
    top_n: int = 2, expansion_weight: float = 0.5
) -> str:
    """P7 twin with the REAL embedding resource: synonyms from derived
    term vectors (embedding-NN), capped expansion as in P6."""
    return f"""WITH {TOK_CTE},
{_emb_syn_ctes(top_n)},
{_expansion_ctes(0, expansion_weight,
                 syn_body=f"SELECT term, synonym FROM tnn WHERE r <= {top_n}")}
SELECT qid, term, qweight, is_expansion FROM expq"""


def _expanded_scored_tail(k: int) -> str:
    """expq → qweight-weighted BM25 → rounded-rank top-k (shared by the
    prefix- and embedding-synonym expanded-retrieval twins)."""
    return f"""scored AS (
  SELECT e.qid, t.doc_id,
         sum( e.qweight
              * log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN expq e ON t.term = e.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY e.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_topk_expanded(
    k: int = 10, prefix_len: int = 4, expansion_weight: float = 0.5
) -> str:
    """Expanded retrieval (Search.java:75): the expansion CTE feeds BM25,
    each term's part weighted by its qweight (expansions at
    {expansion_weight}, originals at their qtf/max_qtf weight)."""
    return f"""WITH {TOK_CTE},
{_expansion_ctes(prefix_len, expansion_weight)},
{_expanded_scored_tail(k)}"""


def sql_bm25_topk_expanded_emb(
    k: int = 10, top_n: int = 2, expansion_weight: float = 0.5
) -> str:
    """Expanded retrieval with the embedding-NN synonym source — the
    Search.java:75 flow over the P7 resource."""
    return f"""WITH {TOK_CTE},
{_emb_syn_ctes(top_n)},
{_expansion_ctes(0, expansion_weight,
                 syn_body=f"SELECT term, synonym FROM tnn WHERE r <= {top_n}")},
{_expanded_scored_tail(k)}"""


# The reference's real input path (S2JsonEntryReader.java:54-159 +
# Indexer.java:307-372 field concat), driven end-to-end over a checked-in
# S2-shaped JSONL fixture. The oracle parses the SAME file with DuckDB's
# independent JSON reader — both engines must agree on missing-field
# defaults and the exact concatenation (incl. separator behavior around
# empty fields). sf_dir-independent by design: the fixture exercises parse
# edge cases the synthetic corpus can't.
S2_FIXTURE = "/root/repo/tests/fixtures/s2_sample.jsonl"
ACCENTS_FIXTURE = "/root/repo/tests/fixtures/webtext_accents.jsonl"
CJK_FIXTURE = "/root/repo/tests/fixtures/webtext_cjk.jsonl"


def sql_cjk_tokens() -> str:
    """Oracle twin of registry.q_cjk_tokens — CJK-bigram-analyzed token
    counts over the checked-in mixed-script webtext fixture. The whole
    analyzer SQL is compiled from textproc's OWN class constant
    (cjk_terms_sql), so the oracle exercises the exact segmentation /
    bigram expansion the Column runs."""
    from .textproc import cjk_terms_sql

    src = (
        f"read_json('{CJK_FIXTURE}', format='newline_delimited', "
        "columns={doc_id: 'BIGINT', text: 'VARCHAR'})"
    )
    return f"""WITH {cjk_terms_sql(src, _STOP_LIST_SQL)}
SELECT doc_id, term, count(*)::BIGINT AS cnt FROM cjk_terms
GROUP BY doc_id, term"""


def sql_fold_tokens() -> str:
    """Oracle twin of registry.q_fold_tokens — accent-folded token
    counts over the checked-in webtext fixture. The fold SQL is compiled
    from textproc's OWN map constants (fold_accents_sql), so the oracle
    exercises the exact translate/replace the Column runs."""
    from .textproc import fold_accents_sql

    return rf"""WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(
    lower(regexp_replace({fold_accents_sql("text")},
                         '[^a-zA-Z0-9]', ' ', 'g')), '\s+')) AS term
  FROM read_json('{ACCENTS_FIXTURE}', format='newline_delimited',
                 columns={{doc_id: 'BIGINT', text: 'VARCHAR'}})
)
SELECT doc_id, term, count(*)::BIGINT AS cnt FROM tok
WHERE term <> '' AND term NOT IN ({_STOP_LIST_SQL})
GROUP BY doc_id, term"""


def sql_s2_extract() -> str:
    return f"""SELECT id,
       concat_ws(' ',
         coalesce(title, ''),
         coalesce(paperAbstract, ''),
         coalesce(journalName, ''),
         coalesce(year, 0)::VARCHAR,
         coalesce(venue, ''),
         coalesce(array_to_string(coalesce(entities, []), ' '), ''),
         coalesce(array_to_string(coalesce(fieldsOfStudy, []), ' '), ''),
         coalesce(array_to_string(coalesce(sources, []), ' '), ''),
         coalesce(array_to_string(
           [a.name for a in coalesce(authors, [])], ' '), '')
       ) AS text
FROM read_json('{S2_FIXTURE}',
  format='newline_delimited',
  columns={{id: 'VARCHAR', title: 'VARCHAR', paperAbstract: 'VARCHAR',
           entities: 'VARCHAR[]', fieldsOfStudy: 'VARCHAR[]',
           authors: 'STRUCT(name VARCHAR, ids VARCHAR[])[]',
           outCitations: 'VARCHAR[]', journalName: 'VARCHAR',
           sources: 'VARCHAR[]', year: 'INTEGER', venue: 'VARCHAR'}})"""


def sql_eval_ap_ndcg(k: int = 20) -> str:
    """E1+E2 over the bm25 top-k ranking with the deterministic synthetic
    judgment rule (evalmetrics.synthetic_judgments), over the wide
    EVAL_QUERYSET (≥20 queries incl. zero-judged NaN-skip cases).
    Judged-only position counting per themisEval.java:94-153,217-273."""
    qid_vals = ", ".join(f"({q})" for q in EVAL_QUERYSET)
    return f"""{_bm25_scored_cte(queryset=EVAL_QUERYSET)},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
judg AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN ((d.doc_id // 7) + q.qid) % 2 = 0 THEN 1 ELSE 0 END
           AS relevance
  FROM documents d CROSS JOIN (VALUES {qid_vals}) q(qid)
  WHERE d.doc_id % 7 = q.qid % 7
),
walked AS (
  SELECT r.qid, r.rank, j.relevance,
         count(*) OVER (PARTITION BY r.qid ORDER BY r.rank) AS counter,
         sum(j.relevance) OVER (PARTITION BY r.qid ORDER BY r.rank) AS found
  FROM ranked r JOIN judg j ON r.qid = j.qid AND r.doc_id = j.doc_id
  WHERE r.rank <= {k}
),
perq AS (
  SELECT qid,
         sum(CASE WHEN relevance = 1 THEN found * 1.0 / counter
                  ELSE 0.0 END) AS ap_num,
         max(found) AS found_total,
         sum(CASE WHEN relevance = 1 THEN 1.0 / log2(counter + 1.0)
                  ELSE 0.0 END) AS dcg
  FROM walked GROUP BY qid
),
rq AS (SELECT qid, count(*) AS r FROM judg WHERE relevance = 1 GROUP BY qid)
SELECT p.qid, round(p.ap_num / p.found_total, 6) AS ap,
       round(p.dcg / list_sum([1.0 / log2(j + 2.0) for j in range(0, r)]),
             6) AS ndcg
FROM perq p JOIN rq USING (qid) WHERE p.found_total > 0"""


def sql_eval_significance(k: int = 20, rounds: int = 256) -> str:
    """Oracle twin of evalmetrics.paired_randomization_test applied to
    AP(bm25 top-k) vs AP(existential doc_id-asc top-k) over
    EVAL_QUERYSET: same judgments rule, integer-quantized diffs, md5
    sign-flip permutations, add-one p-value."""
    qid_vals = ", ".join(f"({q})" for q in EVAL_QUERYSET)
    return f"""{_bm25_scored_cte(queryset=EVAL_QUERYSET)},
rankedA AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
hitsB AS (
  SELECT DISTINCT q.qid, c.doc_id
  FROM counts c JOIN {_qterms_values(queryset=EVAL_QUERYSET)}
    ON c.term = q.term
),
rankedB AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY doc_id ASC) AS rank
  FROM hitsB
),
judg AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN ((d.doc_id // 7) + q.qid) % 2 = 0 THEN 1 ELSE 0 END
           AS relevance
  FROM documents d CROSS JOIN (VALUES {qid_vals}) q(qid)
  WHERE d.doc_id % 7 = q.qid % 7
),
walkedA AS (
  SELECT r.qid, r.rank, j.relevance,
         count(*) OVER (PARTITION BY r.qid ORDER BY r.rank) AS counter,
         sum(j.relevance) OVER (PARTITION BY r.qid ORDER BY r.rank) AS found
  FROM rankedA r JOIN judg j ON r.qid = j.qid AND r.doc_id = j.doc_id
  WHERE r.rank <= {k}
),
apA AS (
  SELECT qid,
         round(sum(CASE WHEN relevance = 1 THEN found * 1.0 / counter
                        ELSE 0.0 END) / max(found), 6) AS ap
  FROM walkedA GROUP BY qid HAVING max(found) > 0
),
walkedB AS (
  SELECT r.qid, r.rank, j.relevance,
         count(*) OVER (PARTITION BY r.qid ORDER BY r.rank) AS counter,
         sum(j.relevance) OVER (PARTITION BY r.qid ORDER BY r.rank) AS found
  FROM rankedB r JOIN judg j ON r.qid = j.qid AND r.doc_id = j.doc_id
  WHERE r.rank <= {k}
),
apB AS (
  SELECT qid,
         round(sum(CASE WHEN relevance = 1 THEN found * 1.0 / counter
                        ELSE 0.0 END) / max(found), 6) AS ap
  FROM walkedB GROUP BY qid HAVING max(found) > 0
),
base AS (
  SELECT a.qid,
         CAST(round((a.ap - b.ap) * 1e6) AS BIGINT) AS d
  FROM apA a JOIN apB b USING (qid)
),
obs AS (
  SELECT abs(sum(d)) AS obs, sum(d) AS sd, count(*) AS n FROM base
),
perm AS (
  SELECT t.r, abs(sum(
    CASE WHEN ('0x' || substr(md5(t.r::VARCHAR || ':' || base.qid::VARCHAR),
                              1, 13))::BIGINT % 2 = 0
         THEN base.d ELSE -base.d END)) AS s
  FROM base, generate_series(1, {rounds}) AS t(r)
  GROUP BY t.r
)
SELECT min(o.n)::BIGINT AS n_queries,
       round(min(o.sd) / 1e6 / min(o.n), 6) AS mean_diff,
       round((1 + sum(CASE WHEN p.s >= o.obs THEN 1 ELSE 0 END))
             / ({rounds} + 1.0), 6) AS p_value
FROM perm p CROSS JOIN obs o"""


def sql_existential() -> str:
    return f"""WITH {TOK_CTE}
SELECT DISTINCT q.qid, c.doc_id, 1.0::DOUBLE AS score
FROM counts c JOIN {_qterms_values()} ON c.term = q.term"""


def sql_existential_topk(k: int = 10) -> str:
    """Existential.java:123-126 top-k variant: all matches score 1.0, so
    the deterministic order is doc_id asc (the Q7 tie refinement)."""
    return f"""WITH {TOK_CTE},
hits AS (
  SELECT DISTINCT q.qid, c.doc_id, 1.0::DOUBLE AS score
  FROM counts c JOIN {_qterms_values()} ON c.term = q.term
),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM hits
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_doc_norms() -> str:
    return f"""WITH {TOK_CTE}
SELECT t.doc_id,
       round(sqrt(sum(pow(t.tf * log2(g.n_docs::DOUBLE / d.df), 2))), 6) AS norm
FROM tfn t JOIN dict d USING (term) CROSS JOIN gstats g
GROUP BY t.doc_id"""


def sql_vsm_scores() -> str:
    return f"""WITH {TOK_CTE},
qw AS (
  SELECT q.qid, q.term, q.qweight * log2(g.n_docs::DOUBLE / d.df) AS qw
  FROM {_qterms_values()} JOIN dict d USING (term) CROSS JOIN gstats g
),
qnorm AS (
  SELECT qid, sqrt(sum(qw * qw)) AS qnorm FROM qw GROUP BY qid
),
dnorm AS (
  SELECT t.doc_id, sqrt(sum(pow(t.tf * log2(g.n_docs::DOUBLE / d.df), 2))) AS norm
  FROM tfn t JOIN dict d USING (term) CROSS JOIN gstats g GROUP BY t.doc_id
),
dots AS (
  SELECT w.qid, t.doc_id,
         sum(t.tf * log2(g.n_docs::DOUBLE / d.df) * w.qw) AS dot
  FROM tfn t JOIN dict d USING (term) JOIN qw w ON t.term = w.term
  CROSS JOIN gstats g
  GROUP BY w.qid, t.doc_id
)
SELECT dots.qid, dots.doc_id,
       round(CASE WHEN dn.norm > 0 AND qn.qnorm > 0
                  THEN dot / (dn.norm * qn.qnorm) ELSE 0.0 END, 6) AS score
FROM dots JOIN dnorm dn USING (doc_id) JOIN qnorm qn USING (qid)"""


def sql_vsm_topk(k: int = 10) -> str:
    """VSM.java:276-436 top-k variant: same rounded-rank window as BM25."""
    return f"""WITH scores AS ({sql_vsm_scores()}),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_eval_prf_mrr(k: int = 20) -> str:
    """Oracle twin of evalmetrics.prf_mrr over the same bm25 ranking and
    synthetic judgments as sql_eval_ap_ndcg; full-rank positions."""
    qid_vals = ", ".join(f"({q})" for q in EVAL_QUERYSET)
    return f"""{_bm25_scored_cte(queryset=EVAL_QUERYSET)},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
judg AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN ((d.doc_id // 7) + q.qid) % 2 = 0 THEN 1 ELSE 0 END
           AS relevance
  FROM documents d CROSS JOIN (VALUES {qid_vals}) q(qid)
  WHERE d.doc_id % 7 = q.qid % 7
),
walked AS (
  SELECT r.qid, r.rank, coalesce(j.relevance, 0) AS relevance
  FROM ranked r LEFT JOIN judg j ON r.qid = j.qid AND r.doc_id = j.doc_id
  WHERE r.rank <= {k}
),
perq AS (
  SELECT qid, sum(relevance) AS rel_ret,
         min(CASE WHEN relevance = 1 THEN rank END) AS first_rel
  FROM walked GROUP BY qid
),
rq AS (SELECT qid, count(*) AS r FROM judg WHERE relevance = 1 GROUP BY qid)
SELECT p.qid,
       round(p.rel_ret * 1.0 / {k}, 6) AS p_at_k,
       round(p.rel_ret * 1.0 / rq.r, 6) AS recall_at_k,
       round(coalesce(1.0 / p.first_rel, 0.0), 6) AS mrr
FROM perq p JOIN rq ON p.qid = rq.qid"""


def sql_eval_rbp_err(k: int = 20, p: float = 0.5) -> str:
    """Oracle twin of evalmetrics.rbp_err over the same bm25 ranking and
    synthetic judgments as sql_eval_ap_ndcg: RBP with persistence p and
    binary-grade ERR (cascade product collapsed to 0.5^found_prev —
    dyadic, engine-exact at the default p)."""
    qid_vals = ", ".join(f"({q})" for q in EVAL_QUERYSET)
    return f"""{_bm25_scored_cte(queryset=EVAL_QUERYSET)},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
judg AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN ((d.doc_id // 7) + q.qid) % 2 = 0 THEN 1 ELSE 0 END
           AS relevance
  FROM documents d CROSS JOIN (VALUES {qid_vals}) q(qid)
  WHERE d.doc_id % 7 = q.qid % 7
),
walked AS (
  SELECT r.qid, r.rank, coalesce(j.relevance, 0) AS relevance
  FROM ranked r LEFT JOIN judg j ON r.qid = j.qid AND r.doc_id = j.doc_id
  WHERE r.rank <= {k}
),
w2 AS (
  SELECT qid, rank, relevance,
         sum(relevance) OVER (PARTITION BY qid ORDER BY rank) - relevance
           AS found_prev
  FROM walked
)
SELECT qid,
       round((1.0 - {p}) * sum(relevance * power({p}, rank - 1)), 6) AS rbp,
       round(sum(relevance * power(0.5, found_prev + 1) / rank), 6) AS err
FROM w2 GROUP BY qid"""


def sql_hard_negatives(k: int = 20, per_query: int = 3) -> str:
    """Oracle twin of ltr.hard_negatives over the eval ranking +
    synthetic judgments: judged positives × the query's per_query
    highest-ranked non-relevant results."""
    qid_vals = ", ".join(f"({q})" for q in EVAL_QUERYSET)
    return f"""{_bm25_scored_cte(queryset=EVAL_QUERYSET)},
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
),
judg AS (
  SELECT q.qid, d.doc_id,
         CASE WHEN ((d.doc_id // 7) + q.qid) % 2 = 0 THEN 1 ELSE 0 END
           AS relevance
  FROM documents d CROSS JOIN (VALUES {qid_vals}) q(qid)
  WHERE d.doc_id % 7 = q.qid % 7
),
pos AS (SELECT qid, doc_id AS pos_doc_id FROM judg WHERE relevance = 1),
pool AS (
  SELECT r.qid, r.doc_id, r.rank
  FROM ranked r
  WHERE r.rank <= {k}
    AND NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.qid = r.qid AND p.pos_doc_id = r.doc_id)
),
negs AS (
  SELECT qid, doc_id AS neg_doc_id,
         (row_number() OVER (PARTITION BY qid
                             ORDER BY rank ASC, doc_id ASC))::BIGINT
           AS neg_rank
  FROM pool
)
SELECT p.qid, p.pos_doc_id, n.neg_doc_id, n.neg_rank
FROM pos p JOIN negs n ON p.qid = n.qid
WHERE n.neg_rank <= {per_query}"""


def sql_doc_keywords(top_terms: int = 3) -> str:
    """Oracle twin of mlt.doc_keywords: corpus-wide top cnt·idf terms per
    doc, BM25-idf salience, rounded-salience rank with term-asc ties."""
    return f"""WITH {TOK_CTE},
ranked AS (
  SELECT c.doc_id, c.term,
         round(c.cnt * log2((g.n_docs - d.df + 0.5) / (d.df + 0.5)), 6)
           AS salience,
         row_number() OVER (
           PARTITION BY c.doc_id
           ORDER BY round(c.cnt * log2((g.n_docs - d.df + 0.5)
                                       / (d.df + 0.5)), 6) DESC,
                    c.term ASC) AS rank
  FROM counts c
  JOIN dict d ON c.term = d.term
  CROSS JOIN gstats g
)
SELECT doc_id, term, salience, rank::BIGINT AS rank
FROM ranked WHERE rank <= {top_terms}"""


def sql_bm25_topk_pruned(k: int = 10, per_term: int = 20) -> str:
    """Oracle twin of prune.prune_postings + BM25 top-k: tfn restricted
    to each term's top per_term postings by (tf desc, doc_id asc) — tf is
    one IEEE division of identical ints on both engines, so the pruning
    rank needs no rounding grain — then the standard scored/ranked tail."""
    return f"""WITH {TOK_CTE},
tfp AS (
  SELECT doc_id, term, tf FROM (
    SELECT doc_id, term, tf,
           row_number() OVER (PARTITION BY term
                              ORDER BY tf DESC, doc_id ASC) AS r
    FROM tfn
  ) WHERE r <= {per_term}
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfp t
  JOIN {_qterms_values(False)} ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


MISSPELLED_QUERYSET: dict[int, str] = {
    1: "spak shufle joim",
    2: "windoq ordr group",
    3: "merg",
}


def sql_did_you_mean_topk(k: int = 10, min_df: int = 1) -> str:
    """Oracle twin of spell.correct_qterms ∘ BM25 top-k over the
    misspelled query set: unknown terms rewrite to their rank-1
    distance-1 correction (df desc, suggestion asc), known terms pass
    through, then the standard scored/ranked tail."""
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in sorted(MISSPELLED_QUERYSET.items())
        for t in sorted(set(q.split()))
    )
    keys = (
        "list_append([substr({c}, 1, i-1) || substr({c}, i+1) "
        "FOR i IN range(1, length({c}) + 1)], {c})"
    )
    return f"""WITH {TOK_CTE},
q(qid, term) AS (VALUES {vals}),
qk AS (SELECT DISTINCT term, unnest({keys.format(c='term')}) AS key FROM q),
dk AS (
  SELECT term AS suggestion, df, unnest({keys.format(c='term')}) AS key
  FROM dict WHERE df >= {min_df}
),
cand AS (
  SELECT DISTINCT qk.term, dk.suggestion, dk.df
  FROM qk JOIN dk ON qk.key = dk.key
  WHERE qk.term <> dk.suggestion
),
best AS (
  SELECT term, suggestion FROM (
    SELECT term, suggestion,
           row_number() OVER (PARTITION BY term
                              ORDER BY df DESC, suggestion ASC) AS r
    FROM cand WHERE levenshtein(term, suggestion) <= 1
  ) WHERE r = 1
),
qc AS (
  SELECT DISTINCT q.qid,
         CASE WHEN d.term IS NOT NULL THEN q.term
              ELSE coalesce(b.suggestion, q.term) END AS term
  FROM q
  LEFT JOIN dict d ON q.term = d.term
  LEFT JOIN best b ON q.term = b.term
),
scored AS (
  SELECT qc.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM tfn t
  JOIN qc ON t.term = qc.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY qc.qid, t.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_explain_topk(pairs_k: int = 3) -> str:
    """Oracle twin of explain.explain_scores over each query's top
    ``pairs_k`` docs: per-term BM25 contributions with their inputs."""
    return f"""{_bm25_scored_cte()},
pairs AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {pairs_k}
)
SELECT p.qid, p.doc_id, t.term,
       round(t.tf, 6) AS tf,
       d.df,
       round(log2((g.n_docs - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       s.length,
       round( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)), 6)
         AS part
FROM tfn t
JOIN (SELECT DISTINCT qid, term FROM {_qterms_values(False)}) q
  ON t.term = q.term
JOIN pairs p ON p.qid = q.qid AND p.doc_id = t.doc_id
JOIN dict d ON t.term = d.term
JOIN docstat s ON t.doc_id = s.doc_id
CROSS JOIN gstats g"""


def sql_search_after_topk(k: int = 10) -> str:
    """Oracle twin of explain.search_after: page 2 must be EXACTLY ranks
    k+1..2k of the canonical ordering, re-ranked 1..k within the page."""
    return f"""{_bm25_scored_cte()},
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, (rank - {k})::BIGINT AS rank
FROM ranked WHERE rank > {k} AND rank <= {2 * k}"""


# negated-term query set: qid -> space-separated terms whose presence
# EXCLUDES a doc from that qid's results (metadata.negated_scores twin).
# Chosen so each negation removes real top-k rows at every sf.
NEG_QUERYSET: dict[int, str] = {
    1: "merge",
    3: "window",
    5: "table scan",
}


def sql_bm25_topk_negated(k: int = 10) -> str:
    """Oracle twin of metadata.negated_scores + rounded-rank top-k:
    standard OR-scored frame minus docs containing any of the qid's
    NEG_QUERYSET terms (tok-level existential, like the Spark
    matching_docs anti side)."""
    neg_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in NEG_QUERYSET.items()
        for t in terms.split()
    )
    return f"""{_bm25_scored_cte()},
negq(qid, term) AS (VALUES {neg_vals}),
excl AS (
  SELECT DISTINCT n.qid, t.doc_id
  FROM tfn t JOIN negq n ON t.term = n.term
),
kept AS (
  SELECT sc.qid, sc.doc_id, sc.score
  FROM scored sc
  WHERE NOT EXISTS (
    SELECT 1 FROM excl e
    WHERE e.qid = sc.qid AND e.doc_id = sc.doc_id
  )
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM kept
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""


def sql_bm25_topk_msm(k: int = 10, min_match: int = 2) -> str:
    """Oracle twin of metadata.conjunctive_scores(min_match=m) + top-k:
    docs must contain at least min(m, #known-terms) of the query's
    distinct dictionary-known terms — Lucene's minimum_should_match."""
    return f"""WITH {TOK_CTE},
qt AS (SELECT DISTINCT qid, term FROM {_qterms_values()}),
need AS (
  SELECT qt.qid, count(DISTINCT qt.term) AS n
  FROM qt JOIN dict d ON qt.term = d.term GROUP BY qt.qid
),
scored AS (
  SELECT q.qid, t.doc_id,
         sum( log2((g.n_docs - d.df + 0.5) / (d.df + 0.5))
              * t.tf * ({K1} + 1.0)
              / (t.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score,
         count(DISTINCT t.term) AS m
  FROM tfn t
  JOIN qt q ON t.term = q.term
  JOIN dict d ON t.term = d.term
  JOIN docstat s ON t.doc_id = s.doc_id
  CROSS JOIN gstats g
  GROUP BY q.qid, t.doc_id
),
ranked AS (
  SELECT sc.qid, sc.doc_id, round(sc.score, 6) AS score,
         row_number() OVER (PARTITION BY sc.qid
                            ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC)
           AS rank
  FROM scored sc
  JOIN need ON sc.qid = need.qid
            AND sc.m >= least({min_match}, need.n)
)
SELECT qid, doc_id, score, rank::BIGINT AS rank
FROM ranked WHERE rank <= {k}"""
