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


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("session_idx", LongType(), False),
    ]
)

# state = (epoch second of the user's last event, current session index)
_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("session_idx", LongType(), True),
    ]
)


def streaming_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of pipeline_ops.sessions.sessionize: per-user keyed
    state carries (last event time, session counter) across micro-batches,
    so a LIVE event stream gets the SAME 1-based session numbering the
    batch op assigns to the full history (pinned stream≡batch in
    tests/test_stateful_streaming.py).

    Ordering caveat (documented, not hidden): state advances in arrival
    order across micro-batches — an event arriving AFTER a later-timestamped
    event of the same user can split sessions differently from the batch
    op. Production fronts this with a watermark + sort-within-trigger
    (the ingest path's event-time windows show the watermark plumbing);
    the equivalence test feeds time-ordered files, the honest contract
    for a log-shipping source. Timestamps floor to epoch seconds exactly
    like the batch op, so the gap comparison is identical.
    """
    gap_s = gap_minutes * 60
    # applyInPandasWithState delivers tz-NAIVE datetimes localized to the
    # session timezone; astype('int64') on those is wall-clock seconds.
    # The batch op uses unix_timestamp (true epoch), so a non-UTC session
    # would silently diverge across DST — convert via the session tz,
    # failing LOUD on ambiguous/nonexistent local times.
    sess_tz = events_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    def _to_epoch_s(ts: pd.Series) -> pd.Series:
        if sess_tz in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            return ts.astype("int64") // 1_000_000_000
        return (
            ts.dt.tz_localize(sess_tz, ambiguous="raise", nonexistent="raise")
            .dt.tz_convert("UTC")
            .astype("int64")
            // 1_000_000_000
        )

    def _session_group(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_ts, idx = state.get if state.exists else (None, 0)
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            state.update((last_ts, idx))
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf["_ts_s"] = _to_epoch_s(pdf["ts"])
        pdf = pdf.sort_values(["_ts_s", "event_id"])
        out_idx = []
        for ts_s in pdf["_ts_s"].tolist():
            if last_ts is None or ts_s - last_ts > gap_s:
                idx += 1
            out_idx.append(idx)
            last_ts = int(ts_s)
        pdf["session_idx"] = out_idx
        state.update((last_ts, idx))
        yield pdf[["event_id", "user_id", "session_idx"]]

    ev = events_stream.select(
        F.col(id_col).cast("long").alias("event_id"),
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_group,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SNAPDIFF_OUT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("prev_doc_id", LongType(), True),
        StructField("status", StringType(), False),
    ]
)

# state = (doc_id, md5(text)) of the url's last-seen snapshot
_SNAP_STATE_SCHEMA = StructType(
    [
        StructField("last_id", LongType(), True),
        StructField("last_hash", StringType(), True),
    ]
)


def _snapdiff_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_id, last_hash = state.get if state.exists else (None, None)
    url = key[0]
    out: list[tuple] = []
    # concat ALL of the group's Arrow chunks before sorting: a group larger
    # than arrow.maxRecordsPerBatch arrives as several chunks, and sorting
    # each independently would apply out-of-order snapshots across the
    # chunk boundary (same rule as _session_group)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        merged = pd.concat(chunks, ignore_index=True).sort_values(
            ["warc_ts", "doc_id"]
        )
        for r in merged.itertuples():
            if last_hash is None:
                status = "new"
            elif r.h != last_hash:
                status = "changed"
            else:
                status = "unchanged"
            out.append((url, int(r.doc_id), last_id, status))
            last_id, last_hash = int(r.doc_id), r.h
    state.update((last_id, last_hash))
    if out:
        yield pd.DataFrame(
            out, columns=["url", "doc_id", "prev_doc_id", "status"]
        )


def streaming_snapshot_diff(
    pages_stream: DataFrame,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of websnap.snapshot_diff: a LIVE crawl stream →
    a change-data stream, one (url, doc_id, prev_doc_id, status) row per
    ARRIVING snapshot. Per-url keyed state carries only (last doc_id,
    last md5) — constant bytes per URL, not per snapshot — so the state
    store holds one small row per distinct URL; downstream, the
    'changed'/'new' rows are exactly the delta a merge_serving_delta /
    re-embedding job consumes.

    stream≡batch contract (pinned in tests): fed snapshots in warc_ts
    order, each url's FINAL emitted row carries the same
    (cur, prev, status) the batch op reports for its two latest
    snapshots. The same arrival-order caveat as streaming_sessionize
    applies and is the honest contract for a crawl-log source.
    """
    hashed = pages_stream.select(
        F.col(url_col).alias("url"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).cast("long").alias("warc_ts"),
        F.md5(F.col(text_col)).alias("h"),
    )
    return hashed.groupBy("url").applyInPandasWithState(
        _snapdiff_group,
        outputStructType=SNAPDIFF_OUT_SCHEMA,
        stateStructType=_SNAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
