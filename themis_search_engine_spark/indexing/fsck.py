"""Index consistency checker (fsck): cross-table invariants as ONE scan set.

A serving index is four derived tables whose invariants can silently rot
through partial writes, bad merges, or a buggy compaction — exactly the
failure class the merge log's loud-replay guard exists for, but at the
TABLE level rather than the lifecycle level. ``verify_index`` recomputes
each invariant from the tables themselves and reports violation COUNTS
(not booleans — a count localizes how bad it is), so operators can run
it after every compaction the way filesystems run fsck after a crash:

* ``df_mismatch``       — dictionary.df ≠ that term's postings row count
                          (dangling df / missing postings);
* ``orphan_postings``   — postings rows whose doc_id has no doc_stats
                          row (a doc deleted from stats but not merged
                          out of postings);
* ``length_mismatch``   — doc_stats.length ≠ Σ counts.cnt for the doc;
* ``maxcnt_mismatch``   — doc_stats.maxcnt ≠ max counts.cnt;
* ``tf_out_of_range``   — postings tf outside (0, 1] (max-normalized by
                          construction, A3);
* ``n_docs_mismatch``   — |global_stats.n_docs − count(doc_stats)|
                          (reported as the absolute delta);
* ``avgdl_mismatch``    — 1 when round(avgdl, 6) ≠ round(avg(length), 6).

Every check is a broadcast-free aggregate or a key-local anti/inner
join on the tables' natural keys (term / doc_id), so fsck costs about
one read of each table — no corpus access, no driver collect. A healthy
index returns all-zero counts; the pytest corrupts each table in turn
and asserts the matching counter fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import InvertedIndex


def verify_index(idx: InvertedIndex) -> DataFrame:
    """(check, violations) — one row per invariant, violation counts
    (0 everywhere ⇔ the index is internally consistent)."""
    post_df = idx.postings_flat.groupBy("term").agg(
        F.count("*").cast("long").alias("_pdf")
    )
    df_mismatch = (
        idx.dictionary.select("term", "df")
        .join(post_df, "term", "full")
        .where(
            F.coalesce("df", F.lit(-1)) != F.coalesce("_pdf", F.lit(-1))
        )
        .agg(F.count("*").cast("long").alias("v"))
    )
    orphan = (
        idx.postings_flat.select("doc_id")
        .join(idx.doc_stats.select("doc_id"), "doc_id", "left_anti")
        .agg(F.count("*").cast("long").alias("v"))
    )
    csum = idx.counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("_len"),
        F.max("cnt").cast("long").alias("_max"),
    )
    joined = idx.doc_stats.select("doc_id", "length", "maxcnt").join(
        csum, "doc_id", "full"
    )
    # empty docs legitimately have a stats row (length 0) and no counts
    # rows, so missing-side values coalesce to 0 here, not a sentinel
    length_mismatch = joined.where(
        F.coalesce("length", F.lit(0)) != F.coalesce("_len", F.lit(0))
    ).agg(F.count("*").cast("long").alias("v"))
    maxcnt_mismatch = joined.where(
        F.coalesce("maxcnt", F.lit(0)) != F.coalesce("_max", F.lit(0))
    ).agg(F.count("*").cast("long").alias("v"))
    tf_bad = idx.postings_flat.where(
        (F.col("tf") <= 0) | (F.col("tf") > 1)
    ).agg(F.count("*").cast("long").alias("v"))
    stats = idx.doc_stats.agg(
        F.count("*").cast("long").alias("_n"),
        F.round(F.avg("length"), 6).alias("_avgdl"),
    )
    gs = idx.global_stats.select(
        F.col("n_docs").cast("long").alias("_gn"),
        F.round(F.col("avgdl"), 6).alias("_gavg"),
    )
    n_docs_mismatch = gs.crossJoin(F.broadcast(stats)).select(
        F.abs(F.col("_gn") - F.col("_n")).cast("long").alias("v")
    )
    avgdl_mismatch = gs.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("_gavg") != F.col("_avgdl"), 1)
        .otherwise(0).cast("long").alias("v")
    )
    checks = [
        ("avgdl_mismatch", avgdl_mismatch),
        ("df_mismatch", df_mismatch),
        ("length_mismatch", length_mismatch),
        ("maxcnt_mismatch", maxcnt_mismatch),
        ("n_docs_mismatch", n_docs_mismatch),
        ("orphan_postings", orphan),
        ("tf_out_of_range", tf_bad),
    ]
    out = None
    for name, df in checks:
        leg = df.select(
            F.lit(name).alias("check"),
            F.coalesce(F.col("v"), F.lit(0)).alias("violations"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out
