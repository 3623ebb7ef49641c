"""Event sessionization: gap-based session assignment + per-session stats.

The web-analytics primitive over the events table: a user's events belong
to one session until a silence longer than ``gap`` separates them. Batch
twin of the streaming ingest-rate windows (streaming/ingest.py); the
stateful streaming analogue is applyInPandasWithState with a session
timeout (streaming/stateful.py shows the state plumbing).

Scale design: ONE shuffle, keyed on the user — both the lag() that finds
session breaks and the running sum that numbers sessions ride the same
(user_id) window partitioning, and the per-session rollup re-uses that
partitioning (groupBy on (user_id, session_idx) is a prefix of the
window key, so AQE plans it shuffle-free after the window). Hot users
(bot traffic) bound a partition at |events per user| — at web scale cap
with a per-user event limit upstream or a (user, day) composite key;
sessions never span the key boundary you choose.

Determinism: events are ordered by (ts, event_id) within a user —
equal-timestamp events break ties on event_id, so session numbering is
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Input events + ``session_idx`` (1-based per user, in time order).

    A new session starts when the gap to the user's previous event
    exceeds ``gap_minutes`` (strictly greater — an exactly-gap-long
    silence keeps the session, matching the closed-interval convention).
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_s = F.lit(gap_minutes * 60)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts, duration_s,
    total_value) — one row per session."""
    s = sessionize(
        events, gap_minutes, user_col=user_col, ts_col=ts_col, id_col=id_col
    )
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).cast("long").alias("duration_s"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window_minutes: int = 60,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(window_start, event_type, n_events, total_value) — tumbling
    event-time windows (epoch-aligned, ``window_start`` in whole epoch
    seconds so the grain is engine-independent).

    The batch twin of :func:`streaming.windows.streaming_event_window_
    counts` — identical aggregation expression, so stream≡batch is
    pinned by construction plus the test. One map-side-combinable
    groupBy; at 100 TB the (window, type) key space is tiny relative to
    input, so partial aggregation collapses almost everything before the
    shuffle."""
    w = F.window(F.col(ts_col), f"{window_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
