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


def embedding_synonyms(
    term_docs: DataFrame,
    embeddings: DataFrame,
    *,
    top_n: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(term, synonym) — P7 (Glove.java:20-55) with a REAL embedding
    resource instead of the prefix stand-in: each term's vector is the
    mean of its containing documents' embedding vectors (a standard
    co-occurrence term embedding), and a term's synonyms are its top-n
    cosine nearest neighbors in that space.

    ``term_docs``: any frame with (term, doc_id) — the index's counts
    table qualifies. Deterministic: neighbors rank on 6-dp-rounded
    cosine with synonym-asc tiebreaks (the same engine-independence
    grain every oracled ranking uses).

    Scale path: the expensive step is term-vector ALL-PAIRS cosine —
    vocabulary-sized, not corpus-sized (|V|² ≪ |docs|²), and at web
    vocabulary sizes the SRP banding already built for embedding
    near-dup (pipeline_ops.simsearch.srp_lsh_pairs) generates the
    candidate pairs instead of the cross join, exactly as it does for
    document vectors.
    """
    e = embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_e")
    )
    tv = (
        term_docs.select("term", "doc_id").distinct()
        .join(e, "doc_id")
        .select("term", F.posexplode("_e").alias("pos", "val"))
        .groupBy("term", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("v"))
        # three consumers below (self-join both legs + norms): cache the
        # postings×dims aggregation (vocab×dims rows — tiny) so the
        # dominant subtree computes once per action, not up to 3×
        .cache()
    )
    nrm = tv.groupBy("term").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("n")
    )
    a = tv.select("term", "pos", F.col("v").alias("va"))
    b = tv.select(F.col("term").alias("synonym"), "pos",
                  F.col("v").alias("vb"))
    cos = (
        a.join(b, "pos")
        .where(F.col("term") != F.col("synonym"))
        .groupBy("term", "synonym")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .join(nrm.select("term", F.col("n").alias("na")), "term")
        .join(
            nrm.select(F.col("term").alias("synonym"),
                       F.col("n").alias("nb")),
            "synonym",
        )
        .select(
            "term", "synonym",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("synonym")
    )
    return (
        cos.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= top_n)
        .select("term", "synonym")
    )
