"""Pure-SQL query surface: the engine's tables as views + BM25 in SQL.

The reference exposes one Java Search loop; a Spark shop's other habit
is ``spark.sql``. Because this engine's index is ordinary DataFrames
(S4-S7 tables), exposing it to SQL costs nothing: register the tables
as temp views once, and the whole BM25 retrieval — IN-pruned postings
scan, idf join, weighted sum, rounded rank — is ONE ANSI SQL statement
Catalyst compiles to the exact plan the DataFrame form produces (views
are named logical plans, not copies; predicate pushdown, broadcast
pricing and whole-stage codegen all still apply).

Rank-identity with bm25_topk is pinned by pytest AND by the driver
oracle (the registered query shares bm25_topk's DuckDB twin verbatim —
same queries, same ordering grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..indexing.build import InvertedIndex

K1 = 2.0
B = 0.75


def register_index_views(
    spark: SparkSession, idx: InvertedIndex, *, prefix: str = "themis_"
) -> list[str]:
    """Register the index's logical tables as temp views
    (``<prefix>postings / dictionary / doc_stats / global_stats``) and
    return the view names. Views are named plans — zero copy; a saved
    serving index can equally be registered straight off
    ``spark.read.parquet`` paths."""
    views = {
        f"{prefix}postings": idx.postings_flat,
        f"{prefix}dictionary": idx.dictionary,
        f"{prefix}doc_stats": idx.doc_stats,
        f"{prefix}global_stats": idx.global_stats,
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)


def bm25_sql(
    qterms_view: str,
    *,
    k: int = 10,
    prefix: str = "themis_",
    term_in: list[str] | None = None,
) -> str:
    """The BM25 top-k retrieval as one ANSI SQL string over the
    registered views. ``term_in`` plants the batch vocabulary as a
    literal IN-list in the WHERE clause — the same parquet-pushdown
    pruning bm25_score_all does (Q2's vocabulary seek)."""
    where = ""
    if term_in:
        lits = ", ".join(f"'{t}'" for t in sorted(set(term_in)))
        where = f"  WHERE p.term IN ({lits})\n"
    return f"""WITH scored AS (
  SELECT q.qid, p.doc_id,
         sum( d.idf * p.tf * ({K1} + 1.0)
              / (p.tf + {K1} * (1.0 - {B} + {B} * s.length / g.avgdl)) ) AS score
  FROM {prefix}postings p
  JOIN {qterms_view} q ON p.term = q.term
  JOIN {prefix}dictionary d ON p.term = d.term
  JOIN {prefix}doc_stats s ON p.doc_id = s.doc_id
  CROSS JOIN {prefix}global_stats g
{where}  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT qid, doc_id, round(score, 6) AS score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT qid, doc_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


def bm25_topk_sql(
    spark: SparkSession,
    idx: InvertedIndex,
    qterms: DataFrame,
    k: int = 10,
    *,
    prefix: str = "themis_",
) -> DataFrame:
    """(qid, doc_id, score, rank) — the whole retrieval via
    ``spark.sql``: registers the index views and the query batch, then
    runs :func:`bm25_sql`. Rank-identical to the DataFrame plan."""
    register_index_views(spark, idx, prefix=prefix)
    qv = f"{prefix}qterms"
    qterms.select("qid", "term").createOrReplaceTempView(qv)
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    return spark.sql(bm25_sql(qv, k=k, prefix=prefix, term_in=terms))
