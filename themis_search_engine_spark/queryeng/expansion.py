"""P6/P7: query expansion (EXTJWNL.java:53-116, Glove.java:20-55).

The reference expands queries via WordNet synsets (P6) or GloVe nearest
neighbors (P7), capping added terms at the number of distinct original
query tokens. Neither resource exists in this sandbox, and neither is in
the BM25-critical path — what carries over is the OPERATOR:

  expand_queries(qterms, synonyms) — add (qid, synonym) rows for known
  query terms, skip terms already in the query, cap added terms per qid
  at the original distinct-term count (EXTJWNL.java:96-108), weight the
  additions below the originals.

:func:`prefix_synonyms` provides a deterministic, corpus-derived synonym
source (same 4-char prefix in the dictionary ≈ crude morphological
relatedness) so the operator is testable and DuckDB-oracle-checkable; a
WordNet/embedding table drops in with the same (term, synonym) schema —
at scale that table is broadcast, exactly like the dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_synonyms(dictionary: DataFrame, prefix_len: int = 4) -> DataFrame:
    """(term, synonym) — distinct dictionary terms sharing a prefix."""
    a = dictionary.select(
        F.col("term"), F.substring("term", 1, prefix_len).alias("pfx")
    ).where(F.length("term") >= prefix_len)
    b = a.select(F.col("term").alias("synonym"), "pfx")
    return (
        a.join(b, "pfx")
        .where(F.col("term") != F.col("synonym"))
        .select("term", "synonym")
    )


def expand_queries(
    qterms: DataFrame,
    synonyms: DataFrame,
    *,
    expansion_weight: float = 0.5,
) -> DataFrame:
    """(qid, term, qweight, is_expansion) — original rows plus capped,
    deterministic expansions (ties: synonym asc)."""
    orig = qterms.select("qid", "term", "qweight").distinct()
    n_orig = orig.groupBy("qid").agg(F.count(F.lit(1)).alias("n_terms"))

    cand = (
        orig.select("qid", "term")
        .join(synonyms, "term")
        .select("qid", F.col("synonym").alias("term"))
        .distinct()
        # drop synonyms already present in the query
        .join(orig.select("qid", "term"), ["qid", "term"], "left_anti")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("term"))
    capped = (
        cand.withColumn("r", F.row_number().over(w))
        .join(n_orig, "qid")
        .where(F.col("r") <= F.col("n_terms"))
        .select(
            "qid", "term",
            F.lit(expansion_weight).alias("qweight"),
        )
    )
    return orig.withColumn("is_expansion", F.lit(False)).unionByName(
        capped.withColumn("is_expansion", F.lit(True))
    )
