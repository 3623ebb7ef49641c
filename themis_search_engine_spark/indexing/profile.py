"""Index observability: distribution profiles of the dictionary.

The reference prints phase timings (Indexer.java:487-495) but has no way
to SEE the index it built — yet every sizing decision this engine makes
at 10^12 docs (salting width for head terms, chunk_bits, IN-list vs join
pruning, broadcast thresholds) is a function of the term-frequency
distribution. This module turns the dictionary into the Zipf profile an
operator actually reads before picking those knobs.

``dictionary_profile``: log2-bucketed df histogram — (df_bucket,
n_terms, postings) where bucket b holds terms with df in [2^b, 2^(b+1)).
One combinable aggregation over the dictionary (vocabulary-sized, never
the corpus); the head buckets' ``postings`` mass is exactly the skew the
build's salted (term, chunk) shuffle exists to absorb, so a healthy
profile shows the top bucket holding few terms but a large posting share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dictionary_profile(dictionary: DataFrame) -> DataFrame:
    """(df_bucket, n_terms, postings) per log2(df) bucket.

    log2 of an exact power of two is exact in IEEE double, so the floor
    is engine-stable (the DuckDB twin uses the same expression)."""
    return (
        dictionary.select(
            F.floor(F.log2("df")).cast("long").alias("df_bucket"), "df"
        )
        .groupBy("df_bucket")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("postings"),
        )
    )
