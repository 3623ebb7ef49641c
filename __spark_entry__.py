"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`themis_search_engine_spark.registry` — the engine's
query registry with matched DuckDB oracle SQL. See SURVEY.md §2 for the
operator inventory each entry covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from themis_search_engine_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: stemmed-pipeline batch BM25 top-10 over sf0.001."""
    return registry.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE_SQL)
