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


def related_items(
    events: DataFrame,
    gap_minutes: int = 360,
    *,
    min_pair: int = 2,
    top_n: int = 5,
    max_items: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    props_col: str = "props",
) -> DataFrame:
    """(item, related, n_ab, lift, rank) — "people also searched for":
    items (the ``k`` property of the event payload) that co-occur in
    the same session far more than chance, ranked by lift
    ``n_ab·N_sessions/(n_a·n_b)`` (6dp-quantized; >1 = positive
    association), related asc ties, top_n per item, pairs below
    ``min_pair`` sessions dropped as noise.

    Scale shape: the only quadratic step is the WITHIN-session pair
    enumeration, bounded by ``max_items`` distinct items per session
    (item-asc cap — the deterministic form of the basket-size cap every
    production co-occurrence miner applies), so pairs ≤ sessions ×
    max_items²; the session-count N is a broadcast 1-row agg; item
    session-counts join on the pair keys. No driver collect, no
    |items|² — only observed pairs materialize.
    """
    s = sessionize(
        events, gap_minutes, user_col=user_col, ts_col=ts_col, id_col=id_col
    )
    items = (
        s.select(
            F.col(user_col).alias("_u"),
            "session_idx",
            F.regexp_extract(F.col(props_col), r'"k":\s*(\d+)', 1)
            .cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    wcap = Window.partitionBy("_u", "session_idx").orderBy("item")
    capped = (
        items.withColumn("_rn", F.row_number().over(wcap))
        .where(F.col("_rn") <= max_items)
        .drop("_rn")
    )
    n_sessions = (
        capped.select("_u", "session_idx").distinct()
        .agg(F.count("*").alias("_n"))
    )
    per_item = capped.groupBy("item").agg(
        F.count("*").cast("long").alias("n_i")
    )
    a = capped.select("_u", "session_idx", F.col("item").alias("ia"))
    b = capped.select("_u", "session_idx", F.col("item").alias("ib"))
    pairs = (
        a.join(b, ["_u", "session_idx"])
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair)
    )
    lifted = (
        pairs.join(per_item.select(F.col("item").alias("ia"),
                                   F.col("n_i").alias("n_a")), "ia")
        .join(per_item.select(F.col("item").alias("ib"),
                              F.col("n_i").alias("n_b")), "ib")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "ia", "ib", "n_ab",
            (
                F.floor(
                    F.col("n_ab") * F.lit(1000000.0) * F.col("_n")
                    / (F.col("n_a") * F.col("n_b"))
                    + F.lit(0.5)
                ) / F.lit(1000000.0)
            ).alias("lift"),
        )
    )
    sym = lifted.select(
        F.col("ia").alias("item"), F.col("ib").alias("related"),
        "n_ab", "lift",
    ).unionByName(
        lifted.select(
            F.col("ib").alias("item"), F.col("ia").alias("related"),
            "n_ab", "lift",
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("lift"), F.asc("related"))
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_n)
        .select("item", "related", "n_ab", "lift", "rank")
    )
