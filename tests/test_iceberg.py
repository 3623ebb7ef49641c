"""Iceberg round-trip for the serving-index tables (SURVEY §7 / north
rule: "Iceberg table of Common-Crawl-style web pages").

The engine's persisted layout is Iceberg-SHAPED parquet: term-bucketed
posting files (build.py documents the ``PARTITIONED BY (bucket(N, term))``
mapping) with snapshot-commit semantics simulated by ordered writes + the
merge log (merge.py). This test exercises the REAL thing — an Iceberg
catalog, ``bucket(N, term)`` partitioning, snapshot-per-merge, and
time-travel back to the pre-merge snapshot — whenever an Iceberg Spark
runtime is on the classpath, and skips with an explicit reason when it
isn't (this sandbox ships no iceberg-spark-runtime jar and has no network
to fetch one; the suite must stay green either way).
"""

import pytest


def _iceberg_available() -> bool:
    try:
        import py4j  # noqa: F401
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        jvm = spark.sparkContext._jvm
        try:
            jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False
    except Exception:
        return False


def test_iceberg_round_trip_or_skip(spark, tmp_path):
    if not _iceberg_available():
        pytest.skip(
            "iceberg-spark-runtime not on the classpath (no jar shipped in "
            "this sandbox, no network to fetch one) — the engine's "
            "Iceberg-shaped parquet layout + merge-log snapshot simulation "
            "stands in; this test runs the real round-trip when the jar "
            "is present"
        )

    # one-time catalog registration (lazy plugin resolution makes runtime
    # conf.set sufficient)
    wh = str(tmp_path / "warehouse")
    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", wh)

    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.idx")
    spark.sql(
        "CREATE TABLE ice.idx.postings (term string, chunk int, "
        "doc_id long, tf double) USING iceberg "
        "PARTITIONED BY (bucket(8, term))"
    )
    base = spark.createDataFrame(
        [("spark", 0, 1, 0.5), ("join", 0, 2, 1.0)],
        "term string, chunk int, doc_id long, tf double",
    )
    base.writeTo("ice.idx.postings").append()  # snapshot 1 (base build)
    delta = spark.createDataFrame(
        [("spark", 0, 3, 0.25)],
        "term string, chunk int, doc_id long, tf double",
    )
    delta.writeTo("ice.idx.postings").append()  # snapshot 2 (delta merge)

    snaps = spark.sql(
        "SELECT snapshot_id FROM ice.idx.postings.snapshots ORDER BY "
        "committed_at"
    ).collect()
    assert len(snaps) == 2
    assert spark.table("ice.idx.postings").count() == 3
    # time-travel to the pre-merge snapshot = resumable-checkpoint read
    pre = spark.read.option(
        "snapshot-id", snaps[0]["snapshot_id"]
    ).table("ice.idx.postings")
    assert pre.count() == 2
