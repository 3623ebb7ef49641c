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


def prefix_synonyms(
    dictionary: DataFrame, prefix_len: int = 4, *, max_group: int = 64
) -> DataFrame:
    """(term, synonym) — distinct dictionary terms sharing a prefix.

    ``max_group`` bounds each prefix group (deterministic: term asc)
    BEFORE the self-join: at web vocabulary sizes head prefixes ("inte",
    "cons") form groups of 10⁴⁺ terms, and an uncapped self-join emits
    |group|² rows. With the cap the output is ≤ max_group² per prefix —
    a synonym table, not a blow-up. The DuckDB twin applies the same cap
    (oracle_sql._expansion_ctes)."""
    w = Window.partitionBy("pfx").orderBy(F.asc("term"))
    a = (
        dictionary.select(
            F.col("term"), F.substring("term", 1, prefix_len).alias("pfx")
        )
        .where(F.length("term") >= prefix_len)
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= max_group)
        .drop("r")
    )
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


def term_vectors(
    term_docs: DataFrame,
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(term, vec: array<double>) — each term's vector is the per-dimension
    mean of its containing documents' embedding vectors (a standard
    co-occurrence term embedding; the P7 / Glove.java:20-55 resource).

    ``term_docs``: any frame with (term, doc_id) — the index's counts
    table qualifies. Two linear shuffles ((term,pos) avg, then term
    collect), both vocabulary-sized.
    """
    e = embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_e")
    )
    return (
        term_docs.select("term", "doc_id").distinct()
        .join(e, "doc_id")
        .select("term", F.posexplode("_e").alias("pos", "val"))
        .groupBy("term", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("v"))
        .groupBy("term")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select(
            "term", F.transform("pv", lambda s: s.getField("v")).alias("vec")
        )
    )


def embedding_synonyms(
    term_docs: DataFrame,
    embeddings: DataFrame,
    *,
    top_n: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    banded: bool = True,
    n_planes: int = 16,
    bands: int = 8,
    cache: bool = True,
) -> DataFrame:
    """(term, synonym) — P7 (Glove.java:20-55) with a REAL embedding
    resource instead of the prefix stand-in: a term's synonyms are its
    top-n cosine nearest neighbors among the :func:`term_vectors`.
    Deterministic: neighbors rank on 6-dp-rounded cosine with synonym-asc
    tiebreaks (the same engine-independence grain every oracled ranking
    uses).

    ``banded=True`` (the default and the 100 TB plan): candidate pairs
    come from the SAME deterministic SRP (Charikar) banding built for
    embedding near-dup (pipeline_ops.simsearch.srp_signature — literal
    ±1 hyperplanes, no RNG), so the expensive step is a band-keyed linear
    shuffle over the vocabulary, and exact cosine runs over candidates
    only. A web vocabulary is 10⁸⁺ terms; the all-pairs plan
    (``banded=False``) is |V|² and exists only as the small-scale oracle
    twin — exactly the cosine_pairs / srp_lsh_pairs split. The DuckDB
    oracle replicates the banding bit-for-bit (oracle_sql._emb_syn_ctes),
    so both engines agree even where LSH recall < 1.

    ``cache``: the term-vector table feeds 2–3 plan legs; caching it
    computes the postings×dims aggregation once per action. The cached
    blocks live until the session evicts them — a long-lived serving
    session that calls this repeatedly should pass ``cache=False`` or
    clear the cache after materializing the result.
    """
    tv = term_vectors(
        term_docs, embeddings, vec_col=vec_col, id_col=id_col
    )
    if cache:
        tv = tv.cache()
    a = tv.select("term", F.col("vec").alias("_va"))
    b = tv.select(F.col("term").alias("synonym"), F.col("vec").alias("_vb"))
    if banded:
        from ..pipeline_ops.simsearch import srp_lsh_candidates

        dim = embeddings.select(F.size(vec_col)).first()[0]
        und = srp_lsh_candidates(
            tv, n_planes=n_planes, bands=bands, dim=dim,
            vec_col="vec", id_col="term",
        )
        # undirected (a<b) candidates → both directions: each side of a
        # candidate pair is a potential neighbor OF the other
        pairs = (
            und.select(F.col("vec_a").alias("term"),
                       F.col("vec_b").alias("synonym"))
            .union(und.select(F.col("vec_b").alias("term"),
                              F.col("vec_a").alias("synonym")))
            .join(a, "term").join(b, "synonym")
        )
    else:
        pairs = a.crossJoin(b).where(F.col("term") != F.col("synonym"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.col(c), F.lit(0.0), lambda acc, v: acc + v * v))
    cos = pairs.select(
        "term", "synonym",
        (dot / (norm("_va") * norm("_vb"))).alias("cosine"),
    )
    w = Window.partitionBy("term").orderBy(
        F.desc(F.round("cosine", 6)), F.asc("synonym")
    )
    return (
        cos.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= top_n)
        .select("term", "synonym")
    )
