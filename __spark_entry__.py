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


# Iteration order for the driver's per-query gate: cheap/stateless entries
# first, the expensive serving-index builds (delta merge, compaction,
# sharded/local serving) last, so a truncated run loses the heaviest
# already-proven plans rather than a cheap unique operator (media_ann_topk
# sat last in round 2 and was the one query the gate never reached).
_LATE = [
    "bm25_topk_wand_sharded",
    "bm25_topk_wand_local",
    "delta_merge_topk",
    "compacted_topk",
]


def _ordered(d: dict) -> dict:
    return {k: d[k] for k in d if k not in _LATE} | {
        k: d[k] for k in _LATE if k in d
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLE_SQL))
